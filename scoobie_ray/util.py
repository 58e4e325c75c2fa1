"""Small shared utilities."""

from __future__ import annotations

_limited = False


def limit_worker_threads(n: int = 1) -> None:
    """Cap Arrow's per-process thread pool to the worker's CPU reservation.

    Ray schedules by declared ``num_cpus`` but does not sandbox threads:
    every worker process gets Arrow's default pool (= machine cores), so a
    '2-cpu' session can silently burn 32 cores inside pyarrow kernels —
    inflating low-parallelism throughput and corrupting scaling
    measurements (BASELINE.md).  Call once per worker process from UDFs /
    actor constructors; idempotent.
    """
    global _limited
    if _limited:
        return
    import pyarrow as pa

    pa.set_cpu_count(n)
    pa.set_io_thread_count(max(1, n))
    _limited = True

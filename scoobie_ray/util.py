"""Small shared utilities."""

from __future__ import annotations

_limited = False


def autoscale_concurrency(lo: int = 1, frac: float = 1.0, cap: int | None = None) -> tuple[int, int]:
    """Actor-pool ``concurrency`` tuple sized from the cluster, not
    hardcoded: (lo, ceil(CPU × frac)).  Hardcoded ``concurrency=2`` caps a
    32-cpu node at 2 actors (VERDICT r1 item 3); this derives the upper
    bound from ``ray.cluster_resources()`` at pipeline-build time and lets
    Ray's autoscaling pool shrink it when input blocks are few."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    hi = max(lo, int(cpus * frac + 0.999))
    if cap is not None:
        hi = min(hi, cap)
    return (lo, hi)


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

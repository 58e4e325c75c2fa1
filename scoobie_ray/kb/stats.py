"""Offline KB statistics — the remaining PostgresKB analytics layer.

- :func:`regex_distributions` — per (regex, datatype property): the share
  of the property's literal values matching the regex, keeping ratios
  above the threshold (PostgresKB.calculateRegexDistributions:1605-1631;
  the reference keeps >0.9, PostgresKB.java:1617-1626);
- :func:`coverage_ambiguity` — per (type, property): coverage (share of
  the type's instances carrying the property) and mean ambiguity (mean
  number of subjects sharing one of the property's literals)
  (PostgresKB.getCoverageAmbiguity:1385-1422 over the histogram views);
- :func:`document_frequency` — corpus doc-frequency per literal, a Ray
  Dataset job over spotted docs (the reference builds a Lucene index,
  TextCorpus.getLuceneIndex:141-176);
- :func:`proper_name_ratings` — rating = coverage / ambiguity × IDF
  (PostgresKB.calculateProperNameStatistics:1424-1484): which datatype
  properties are good proper-name keys for a class;
- :func:`property_kinds` — datatype vs object property probe
  (PostgresKB.getPropertyType:852-875).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

from .bundle import KBBundle


def regex_match_counts(bundle: KBBundle, patterns: dict[str, str]) -> pa.Table:
    """(regex_name, predicate, n_match, n_total) per pattern × datatype
    property — integer-exact (the hashable gate surface;
    :func:`regex_distributions` derives its ratios from it)."""
    sym = bundle.symbols
    lits = bundle.literals["literal"].to_pylist()
    preds = sym["predicate"].to_numpy(zero_copy_only=False)
    objs = sym["object"].to_numpy(zero_copy_only=False)
    out_name, out_pred, out_match, out_total = [], [], [], []
    for name, rx in patterns.items():
        compiled = re.compile(rx)
        match_flags = np.fromiter(
            (compiled.fullmatch(lits[o]) is not None for o in objs),
            dtype=bool,
            count=len(objs),
        )
        for p in np.unique(preds):
            mask = preds == p
            out_name.append(name)
            out_pred.append(int(p))
            out_match.append(int(match_flags[mask].sum()))
            out_total.append(int(mask.sum()))
    return pa.table(
        {
            "regex_name": pa.array(out_name, pa.string()),
            "predicate": pa.array(out_pred, pa.int64()),
            "n_match": pa.array(out_match, pa.int64()),
            "n_total": pa.array(out_total, pa.int64()),
        }
    )


def regex_distributions(
    bundle: KBBundle, patterns: dict[str, str], threshold: float = 0.9
) -> pa.Table:
    """(regex_name, predicate, ratio) rows with ratio > threshold —
    ratio view over :func:`regex_match_counts`."""
    c = regex_match_counts(bundle, patterns)
    out_name, out_pred, out_ratio = [], [], []
    for name, p, n_match, n_total in zip(
        c["regex_name"].to_pylist(),
        c["predicate"].to_pylist(),
        c["n_match"].to_pylist(),
        c["n_total"].to_pylist(),
    ):
        ratio = n_match / n_total if n_total else 0.0
        if ratio > threshold:
            out_name.append(name)
            out_pred.append(p)
            out_ratio.append(ratio)
    return pa.table(
        {
            "regex_name": pa.array(out_name, pa.string()),
            "predicate": pa.array(out_pred, pa.int64()),
            "ratio": pa.array(out_ratio, pa.float64()),
        }
    )


def coverage_ambiguity_counts(bundle: KBBundle) -> pa.Table:
    """Integer-exact coverage/ambiguity statistics per (type, datatype
    property): covered instances, total instances, Σ literal ambiguity
    over symbol rows, symbol-row count.  The hashable (no-float) form —
    the ``kb_coverage`` oracle checks this table; :func:`coverage_ambiguity`
    derives its ratios from it."""
    import numpy as np

    sym = bundle.symbols
    types = bundle.types
    if len(sym) == 0 or len(types) == 0:
        e = pa.array([], pa.int64())
        return pa.table(
            {"type": e, "predicate": e, "covered": e, "instances": e,
             "amb_sum": e, "amb_n": e}
        )

    # fully vectorized (r3): CSR over the RAW (subject, type) rows (no
    # dedupe — matches the original loop exactly, including repeated rows
    # double-counting), symbols exploded over each subject's types with
    # one repeat, and every per-(type, predicate) statistic reduced with
    # lexsort + boundary scans
    t_subj = types["subject"].to_numpy(zero_copy_only=False).astype(np.int64)
    t_type = types["type"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(t_subj, kind="mergesort")
    t_subj, t_type = t_subj[order], t_type[order]
    subj_ids = np.unique(t_subj)
    t_starts = np.searchsorted(t_subj, subj_ids)
    t_ends = np.searchsorted(t_subj, subj_ids, side="right")
    # instances per type = raw row count per type
    inst_keys, inst_counts = np.unique(t_type, return_counts=True)

    s_arr = sym["subject"].to_numpy(zero_copy_only=False).astype(np.int64)
    p_arr = sym["predicate"].to_numpy(zero_copy_only=False).astype(np.int64)
    o_arr = sym["object"].to_numpy(zero_copy_only=False).astype(np.int64)

    # ambiguity per literal: #distinct subjects sharing it
    os_pairs = np.unique(np.stack([o_arr, s_arr], axis=1), axis=0)
    amb_keys, amb_counts = np.unique(os_pairs[:, 0], return_counts=True)
    amb_of_row = amb_counts[np.searchsorted(amb_keys, o_arr)]

    # explode symbol rows over their subject's types
    pos = np.searchsorted(subj_ids, s_arr)
    pos = np.minimum(pos, len(subj_ids) - 1)
    ok = subj_ids[pos] == s_arr
    st = np.where(ok, t_starts[pos], 0)
    nt = np.where(ok, t_ends[pos] - t_starts[pos], 0)
    total = int(nt.sum())
    if total == 0:
        e = pa.array([], pa.int64())
        return pa.table(
            {"type": e, "predicate": e, "covered": e, "instances": e,
             "amb_sum": e, "amb_n": e}
        )
    row_of = np.repeat(np.arange(len(s_arr)), nt)
    base = np.concatenate([[0], np.cumsum(nt)[:-1]])
    q = np.arange(total) - base[row_of]
    tt = t_type[st[row_of] + q]
    pp = p_arr[row_of]
    ss = s_arr[row_of]
    aa = amb_of_row[row_of]

    order = np.lexsort((ss, pp, tt))
    tt, pp, ss, aa = tt[order], pp[order], ss[order], aa[order]
    first_tp = np.empty(total, dtype=bool)
    first_tp[0] = True
    first_tp[1:] = (tt[1:] != tt[:-1]) | (pp[1:] != pp[:-1])
    gidx = np.flatnonzero(first_tp)
    group = np.cumsum(first_tp) - 1
    amb_sum = np.bincount(group, weights=aa).astype(np.int64)
    amb_n = np.diff(np.concatenate([gidx, [total]]))
    # covered = distinct subjects per (t, p): subjects are sorted within
    # each group, so count boundaries where (group, s) changes
    new_s = np.empty(total, dtype=bool)
    new_s[0] = True
    new_s[1:] = first_tp[1:] | (ss[1:] != ss[:-1])
    covered = np.bincount(group, weights=new_s).astype(np.int64)
    tt_u, pp_u = tt[gidx], pp[gidx]
    inst = inst_counts[np.searchsorted(inst_keys, tt_u)]
    return pa.table(
        {
            "type": pa.array(tt_u, pa.int64()),
            "predicate": pa.array(pp_u, pa.int64()),
            "covered": pa.array(covered, pa.int64()),
            "instances": pa.array(inst.astype(np.int64), pa.int64()),
            "amb_sum": pa.array(amb_sum, pa.int64()),
            "amb_n": pa.array(amb_n.astype(np.int64), pa.int64()),
        }
    )


def coverage_ambiguity(bundle: KBBundle) -> pa.Table:
    """(type, predicate, coverage, ambiguity) per type/datatype-property —
    ratio view over :func:`coverage_ambiguity_counts`."""
    c = coverage_ambiguity_counts(bundle)
    covered = c["covered"].to_numpy(zero_copy_only=False)
    instances = c["instances"].to_numpy(zero_copy_only=False)
    amb_sum = c["amb_sum"].to_numpy(zero_copy_only=False)
    amb_n = c["amb_n"].to_numpy(zero_copy_only=False)
    import numpy as np

    return pa.table(
        {
            "type": c["type"],
            "predicate": c["predicate"],
            "coverage": pa.array(
                covered / np.maximum(instances, 1), pa.float64()
            ),
            "ambiguity": pa.array(amb_sum / np.maximum(amb_n, 1), pa.float64()),
        }
    )


def document_frequency(docs_ds, kb, concurrency: int | None = 2) -> pa.Table:
    """Doc frequency per KB literal over a corpus — spot each doc and count
    distinct docs per literal (groupby aggregate over exploded mentions)."""
    from ray.data.aggregate import Sum

    from ..stages.spot import Spotter

    def explode(batch: pa.Table) -> pa.Table:
        lits, ns = [], []
        for ml in batch["mention_literal"].to_pylist():
            for lit in set(ml):
                lits.append(lit)
                ns.append(1)
        return pa.table(
            {"literal": pa.array(lits, pa.int64()), "n": pa.array(ns, pa.int64())}
        )

    spotted = docs_ds.map_batches(
        Spotter,
        fn_constructor_kwargs={"kb": kb},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).map_batches(explode, batch_format="pyarrow")
    df = spotted.groupby("literal").aggregate(Sum("n", alias_name="df"))
    t = df.to_arrow_refs()
    import ray

    parts = [ray.get(r) for r in t]
    import pyarrow as _pa

    return _pa.concat_tables([p for p in parts if p.num_rows >= 0])


def proper_name_ratings(
    bundle: KBBundle,
    cov_amb: pa.Table | None = None,
    doc_freq: pa.Table | None = None,
    n_docs: int = 1,
) -> pa.Table:
    """(cluster, predicate, rating, coverage, ambiguity, idf): rating =
    coverage / ambiguity × mean IDF of the property's literals."""
    if cov_amb is None:
        cov_amb = coverage_ambiguity(bundle)
    cluster_of = dict(
        zip(
            bundle.type_clusters["type"].to_pylist(),
            bundle.type_clusters["cluster"].to_pylist(),
        )
    )
    import numpy as np

    # mean idf per predicate over its literals — vectorized over the
    # KB-sized symbols table (r3; the per-row loop was the last KB-build
    # Python hotspot): df lookup by searchsorted, per-predicate mean by
    # bincount on predicate codes
    sym = bundle.symbols
    p_arr = sym["predicate"].to_numpy(zero_copy_only=False).astype(np.int64)
    o_arr = sym["object"].to_numpy(zero_copy_only=False).astype(np.int64)
    if doc_freq is not None and len(doc_freq):
        dfk = doc_freq["literal"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = doc_freq["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(dfk, kind="mergesort")
        dfk, dfv = dfk[order], dfv[order]
        pos = np.minimum(np.searchsorted(dfk, o_arr), len(dfk) - 1)
        df_row = np.where(dfk[pos] == o_arr, dfv[pos], 0)
    else:
        df_row = np.zeros(len(o_arr), dtype=np.int64)
    idf_row = np.log((1 + n_docs) / (1 + df_row))
    idf_sum: dict[int, float] = {}
    idf_n: dict[int, int] = {}
    if len(p_arr):
        preds_u, codes = np.unique(p_arr, return_inverse=True)
        sums = np.bincount(codes, weights=idf_row)
        ns = np.bincount(codes)
        idf_sum = dict(zip(preds_u.tolist(), sums.tolist()))
        idf_n = dict(zip(preds_u.tolist(), ns.tolist()))

    rows = []
    for t, p, cov, amb in zip(
        cov_amb["type"].to_pylist(),
        cov_amb["predicate"].to_pylist(),
        cov_amb["coverage"].to_pylist(),
        cov_amb["ambiguity"].to_pylist(),
    ):
        idf = idf_sum.get(p, 0.0) / max(1, idf_n.get(p, 1))
        rows.append(
            {
                "cluster": cluster_of.get(t, t),
                "predicate": p,
                "rating": (cov / max(amb, 1e-9)) * idf,
                "coverage": cov,
                "ambiguity": amb,
                "idf": idf,
            }
        )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "cluster": pa.array([], pa.int64()),
            "predicate": pa.array([], pa.int64()),
            "rating": pa.array([], pa.float64()),
            "coverage": pa.array([], pa.float64()),
            "ambiguity": pa.array([], pa.float64()),
            "idf": pa.array([], pa.float64()),
        }
    )


def property_kinds(bundle: KBBundle) -> pa.Table:
    """(predicate, kind) — 'datatype' | 'object' | 'both'
    (PostgresKB.getPropertyType:852-875)."""
    dt = set(bundle.symbols["predicate"].to_pylist())
    ob = set(bundle.relations["predicate"].to_pylist())
    preds = sorted(dt | ob)
    kinds = [
        "both" if p in dt and p in ob else ("datatype" if p in dt else "object")
        for p in preds
    ]
    return pa.table(
        {
            "predicate": pa.array(preds, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )

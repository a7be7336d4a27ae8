"""Brute-force all-pairs oracle — the golden reference (SURVEY.md §5.2).

Re-implements the reference's comparison loop (``comparison.cpp:34-42``:
every pair (left < right), ``bothVideosMatch`` per pair) over the SAME
signature config and the SAME ``functions/similarity`` kernels the pipeline
uses, but with no LSH, no capping, no sampling — so pipeline-vs-oracle
recall measures exactly the candidate-generation loss the north rule
polices (>= 0.99).

Containment is checked EXACTLY (substring on canonical text) for every
size-skewed pair — the pipeline's anchor channel + estimate can only lose
against this, never win (no false 'oracle misses').

Driver-side, pure numpy/pandas; intended for corpora up to a few thousand
docs (the 'small' fixture scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import hashing as H
from ..functions import similarity as S
from ..functions.text import canonicalize, tokenize


def compute_signatures(corpus: pa.Table, cfg: PipelineConfig) -> dict:
    """Driver-side fingerprints via the shared kernels (one big batch)."""
    texts = corpus.column("content").to_pylist()
    canon = [canonicalize(t if t is not None else "") for t in texts]
    if cfg.tokenizer == "bytes":
        th, off = H.byte_tokenize_hash(corpus.column("content"), cfg.seed)
    else:
        token_lists = [tokenize(c) for c in canon]
        th, off = H.hash_token_lists(token_lists)
    sh, sh_off = H.shingles_from_tokens(th, off, cfg.shingle_k, cfg.seed)
    minhash = H.minhash_signatures_cfg(sh, sh_off, cfg)
    _, head, tail = H.simhash_doc_slots(sh, sh_off, cfg.head_tail_window)
    n_sh = np.diff(sh_off).astype(np.int64)
    low = n_sh < cfg.min_shingles
    head[low] = H.U64(0)
    tail[low] = H.U64(0)
    return {"canon": canon, "n_tokens": np.diff(off).astype(np.int64),
            "n_shingles": n_sh, "low": low, "minhash": minhash,
            "head": head, "tail": tail}


def brute_force_pairs(corpus: pa.Table, doc_ids: np.ndarray,
                      cfg: PipelineConfig) -> pd.DataFrame:
    """All matching pairs (near + containment), a < b by doc_id.

    Exact duplicates (identical canonical text) match trivially through the
    near path (jaccard 1, hamming 0).  Low-content docs are near-dup
    excluded but exact-dup eligible — mirrored here by an explicit
    canonical-equality path (the pipeline's exact-dedup stage).
    """
    sig = compute_signatures(corpus, cfg)
    n = len(doc_ids)
    canon = sig["canon"]
    out = []
    for i in range(n - 1):
        j = np.arange(i + 1, n)
        jac = S.jaccard_from_minhash(
            np.broadcast_to(sig["minhash"][i], (len(j), cfg.num_perms)),
            sig["minhash"][j])
        r = S.evaluate_pairs(
            np.repeat(sig["head"][i], len(j)), sig["head"][j],
            np.repeat(sig["tail"][i], len(j)), sig["tail"][j],
            np.repeat(sig["n_tokens"][i], len(j)), sig["n_tokens"][j],
            jac, cfg)
        match = r["match"].copy()
        kind = np.where(match, "near", "")

        # exact path: identical canonical text always matches
        exact = np.fromiter((canon[i] == canon[k] and bool(canon[i])
                             for k in j), dtype=bool, count=len(j))
        newly = exact & ~match
        match |= exact
        kind = np.where(newly, "near", kind)

        if cfg.containment:
            nsh_i, nsh_j = sig["n_shingles"][i], sig["n_shingles"][j]
            ratio_ok = (np.maximum(nsh_i, nsh_j)
                        >= cfg.min_containment_ratio
                        * np.minimum(nsh_i, nsh_j))
            guard = (np.minimum(nsh_i, nsh_j) >= cfg.min_shingles)
            cand = ratio_ok & guard & ~match
            for kk in np.flatnonzero(cand):
                k = j[kk]
                sm, bg = ((canon[i], canon[k])
                          if len(canon[i]) <= len(canon[k])
                          else (canon[k], canon[i]))
                if sm and sm in bg:
                    match[kk] = True
                    kind[kk] = "contain"

        hit = np.flatnonzero(match)
        if len(hit):
            a = np.minimum(doc_ids[i], doc_ids[j[hit]])
            b = np.maximum(doc_ids[i], doc_ids[j[hit]])
            out.append(pd.DataFrame({
                "a": a, "b": b, "jaccard": jac[hit],
                "hamming": r["hamming"][hit], "kind": kind[hit]}))
    if not out:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64"),
                             "hamming": pd.Series(dtype="int64"),
                             "kind": pd.Series(dtype="object")})
    return pd.concat(out, ignore_index=True)


def union_find_clusters(doc_ids: np.ndarray,
                        pairs: pd.DataFrame) -> pd.DataFrame:
    """Driver union-find with path compression; cluster_id = min(doc_id)."""
    parent = {int(d): int(d) for d in doc_ids}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["a"].to_numpy(), pairs["b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return pd.DataFrame({
        "doc_id": [int(d) for d in doc_ids],
        "cluster_id": [find(int(d)) for d in doc_ids]})


def cluster_pair_recall(oracle_clusters: pd.DataFrame,
                        pipeline_clusters: pd.DataFrame) -> float:
    """Dup-pair recall vs reference clusters (the north-rule metric):
    of all co-clustered pairs in the oracle partition, the fraction
    co-clustered by the pipeline — computed arithmetically per cluster,
    never materializing the pair set."""
    merged = oracle_clusters.merge(
        pipeline_clusters[["doc_id", "cluster_id"]], on="doc_id",
        suffixes=("_o", "_p"))
    total = 0
    hit = 0
    for _, grp in merged.groupby("cluster_id_o"):
        n = len(grp)
        if n < 2:
            continue
        total += n * (n - 1) // 2
        for _, sub in grp.groupby("cluster_id_p"):
            m = len(sub)
            hit += m * (m - 1) // 2
    return 1.0 if total == 0 else hit / total

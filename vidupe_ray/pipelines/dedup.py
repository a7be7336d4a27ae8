"""The flagship pipeline: read -> normalize -> exact dedup -> fingerprint ->
LSH candidates -> verify (+ substring confirm) -> connected components ->
clusters.  SURVEY.md §3.4 lifecycle, Ray-Data-first.

Dataflow (shuffles marked):

    corpus_ds
      | map_batches(normalize)                 tasks, zero-copy Arrow
      | groupby(sha256_canon) tiny rows        SHUFFLE 1 (exact dedup)
      | winner semi-join (broadcast)           no shuffle
      | map_batches(FingerprintActor)          actor pool
      | [checkpoint signatures]                resumable, config-hash keyed
      | map_batches(BandEmitter)               tasks
      | groupby(key) + in-group verify         SHUFFLE 2 (LSH)
      | groupby(a, b) dedupe                   SHUFFLE 3 (tiny pair rows)
      | substring confirm (broadcast content)  tasks
      | union exact edges + near + contain
      | alternating-star CC rounds             SHUFFLES 4..k (tiny edges)
      | cluster assignment + canonical pick    broadcast parent map
      -> clusters / pairs / rejects datasets + metrics

Only signatures and tiny pair/edge rows cross the shuffles; content crosses
the wire exactly once (the winner filter reads it where it lies).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..config import PipelineConfig
from ..state.joins import lookup_join
from ..stages import cluster as cluster_stage
from ..stages import exact_dedup as ed
from ..stages import lsh
from ..stages import verify_contain as vc
from ..stages.fingerprint import fingerprint_dataset
from ..stages.normalize import normalize_batch, apply_lang_filter


@dataclass
class DedupResult:
    docs: "rd.Dataset"          # normalized metadata incl. status (all docs)
    winners: "rd.Dataset"       # exact-dedup winner rows (raw content + doc_id)
    signatures: "rd.Dataset"    # fingerprints of winners
    pairs: "rd.Dataset"         # verified duplicate pairs (near + contain)
    clusters: "rd.Dataset"      # doc_id, cluster_id, is_canonical, ...
    rejects: "rd.Dataset"       # tagged invalid rows
    metrics: dict = field(default_factory=dict)


def corpus_size_estimate(ds) -> int:
    """Estimated in-memory bytes of the corpus WITHOUT executing the plan:
    source parquet file sizes x a 2x decompression factor when the dataset
    has file inputs; 0 (already resident, pinning is free) for in-memory
    datasets.  Feeds the pin_corpus auto gate."""
    import os
    try:
        files = ds.input_files()
    except Exception:
        files = None
    if not files:
        return 0
    total = 0
    for f in files:
        try:
            total += os.path.getsize(f)
        except OSError:
            return 1 << 62          # un-statable source: assume huge
    return 2 * total


def run_dedup(corpus_ds, cfg: PipelineConfig | None = None,
              checkpoint_dir: str | None = None,
              skip_repartition: bool = False) -> DedupResult:
    """Ray must already be initialised by the caller (driver contract).

    ``skip_repartition=True``: the caller guarantees the input already has
    a pipeline-friendly block count (e.g. ``read_corpus(...,
    num_blocks=2*cpus)`` — reader-side row-group splitting, no all-to-all;
    a wrong block count costs throughput, never correctness)."""
    cfg = cfg or PipelineConfig()
    metrics = {}
    t0 = time.perf_counter()
    source_ds = corpus_ds          # pre-filter handle: file-identity key

    if cfg.lang_allowlist:
        corpus_ds = corpus_ds.map_batches(
            lambda t: apply_lang_filter(t, cfg.lang_allowlist),
            batch_format="pyarrow")

    # right-size the block count once, up front: every downstream shuffle's
    # task fan-out scales with it (parquet row-group splits often produce
    # hundreds of tiny blocks).  The repartitioned RAW corpus is pinned
    # once; content enters the object store exactly one time and every
    # content consumer (normalize, winner filter -> fingerprint,
    # containment fetch) streams from the same blocks.  The canonical text
    # is never materialized anywhere — stages re-canonicalize on the fly
    # (recompute beats shipping; SURVEY.md §7.4 wide-record rule).
    # floor of 32: at small widths 2x-CPUs blocks are too coarse — the
    # straggler tail is 1/nblocks of the dominant stage (measured at
    # 4 CPUs: 8 blocks 45.7 s vs 32 blocks 39.4 s fused wall, repeatable;
    # no effect at 32 CPUs where 64 blocks already bound the tail)
    nblocks = cfg.target_blocks or max(
        32, 2 * int(ray.cluster_resources().get("CPU", 8)))

    # stamp doc_id into the (about-to-be-pinned) corpus blocks ONCE:
    # every downstream consumer (winner anti-join, fingerprint,
    # containment fetch, resume splits) re-scans the corpus lazily and
    # would otherwise re-derive 500k+ identity hashes per scan
    from ..stages.normalize import batch_doc_ids

    def _stamp_ids(batch: pa.Table) -> pa.Table:
        if "doc_id" in batch.column_names:
            return batch
        return batch.append_column(
            "doc_id", pa.array(batch_doc_ids(batch), pa.int64()))

    # size estimate from the PRE-FILTER handle (input_files() returns []
    # on any transformed dataset — estimating post-lang-filter would make
    # est=0 and unconditionally pin 100TB-class corpora; ADVICE r2).  The
    # pre-filter size is a conservative upper bound.  NOTE: skipping the
    # repartition when the source block count "looks fine" was tried and
    # measured 55% SLOWER end-to-end (45.7 s -> 70.9 s back-to-back): 32
    # fat blocks starve the 2x-CPUs task slack downstream stages rely on.
    est = corpus_size_estimate(source_ds)
    if not skip_repartition:
        corpus_ds = corpus_ds.repartition(nblocks)
    corpus = corpus_ds.map_batches(_stamp_ids, batch_format="pyarrow")
    pin = cfg.pin_corpus
    if pin is None:
        # auto gate: pin only when the corpus fits comfortably in the
        # object store (at 100 TB it never does — the source re-read wins)
        store = ray.cluster_resources().get("object_store_memory", 0)
        pin = bool(store) and est <= cfg.pin_corpus_fraction * store
        metrics["pin_corpus_auto"] = pin
        metrics["corpus_bytes_estimate"] = est

    # metadata-only normalize: hashes + counters + status, ~100 B/row.
    # With a checkpoint dir the docs/membership tables are cached keyed by
    # FILE identity (path+size+mtime — the reference's md5(basename+mtime)
    # cache key, db.cpp:22-30): an unchanged corpus skips the normalize
    # scan and the exact-dedup shuffle entirely on re-runs/rematch.
    docs = membership = None
    meta_key = None
    if checkpoint_dir:
        from ..state.checkpoint import (corpus_cache_key, load_meta_cache,
                                        save_meta_cache)
        meta_key = corpus_cache_key(source_ds, cfg)
        cached_docs = load_meta_cache(checkpoint_dir, meta_key,
                                      "docs_meta")
        cached_mem = load_meta_cache(checkpoint_dir, meta_key,
                                     "membership")
        if cached_docs is not None and cached_mem is not None:
            docs = cached_docs.materialize()
            membership = cached_mem.materialize()
            metrics["meta_resumed"] = True

    fuse_fp = cfg.fused_fingerprint
    if fuse_fp is None:
        # auto: the per-document signature checkpoint/resume contract
        # needs the winners-first plan; everything else fuses
        fuse_fp = checkpoint_dir is None
    sig_wide = None
    _SIG_EXTRA = ["n_tokens", "n_shingles", "simhash", "simhash_head",
                  "simhash_tail", "minhash", "anchors", "low_content"]

    if docs is None and fuse_fp:
        # FUSED normalize+fingerprint (round-4 floor work): ONE
        # read->stamp->normalize->fingerprint pass over the source.
        # Signatures are computed for ALL docs (exact-dup losers/rejects
        # dropped afterwards by the same removal filter the winner
        # anti-join uses), so raw content NEVER enters the object store:
        # the 3 GB content pin and its second scan by the fingerprint
        # stage both disappear — only the ~0.5 GB meta+signature table
        # materializes.  Containment re-reads the source for its
        # candidate subset (overlapped with CC).  Trade-off: dup_rate x
        # fingerprint compute is wasted on losers (cfg.fused_fingerprint
        # docstring; at the bench corpus's <1% exact-dup rate the saved
        # content pass wins outright).
        from ..stages.fingerprint import _cached_fingerprinter

        def _fused_fp(batch: pa.Table) -> pa.Table:
            batch = _stamp_ids(batch)
            meta = normalize_batch(batch)
            sigs = _cached_fingerprinter(cfg)(batch)
            for c in _SIG_EXTRA:
                meta = meta.append_column(c, sigs.column(c))
            return meta

        sig_wide = corpus_ds.map_batches(
            _fused_fp, batch_format="pyarrow",
            batch_size=cfg.batch_size).materialize()
        # materialize the SLIM meta projection (~100 B/row) so the wide
        # table (minhash = num_perms x 8 B/row, ~22 GB at 20M docs) can
        # be RELEASED once the winner signatures are extracted — keeping
        # `docs` a lazy projection of sig_wide pinned both wide copies
        # (sig_wide + signatures) through the band sort and overflowed
        # the object store into a disk-full spill at 20M docs
        docs = sig_wide.drop_columns(_SIG_EXTRA).materialize()
        membership = ed.exact_dedup(docs, cfg).materialize()
        metrics["meta_resumed"] = False
        metrics["fused_fingerprint"] = True
    elif docs is None and pin:
        # FUSED pin+normalize (round-3 scaling work): when the corpus is
        # being pinned anyway, ONE read->stamp->normalize pass materializes
        # blocks carrying content + metadata together — the separate pin
        # barrier (and its second scan of the pinned blocks by normalize)
        # disappears; ``docs`` becomes a zero-copy column projection of the
        # pinned blocks.  Measured: pin 4.4 s + normalize 3.6 s -> one
        # ~5 s stage at 32 CPUs, and ~19.5 s -> ~13 s at 8.
        def _fused(batch: pa.Table) -> pa.Table:
            batch = _stamp_ids(batch)
            meta = normalize_batch(batch)
            return meta.append_column("content", batch.column("content"))

        corpus = corpus_ds.map_batches(
            _fused, batch_format="pyarrow").materialize()
        docs = corpus.drop_columns(["content"])
        membership = ed.exact_dedup(docs, cfg).materialize()
        metrics["meta_resumed"] = False
        metrics["fused_pin_normalize"] = True
        if checkpoint_dir and meta_key:
            save_meta_cache(checkpoint_dir, meta_key, "docs_meta", docs)
            save_meta_cache(checkpoint_dir, meta_key, "membership",
                            membership)
    else:
        if pin:
            corpus = corpus.materialize()
        if docs is None:
            docs = corpus.map_batches(normalize_batch,
                                      batch_format="pyarrow").materialize()
            membership = ed.exact_dedup(docs, cfg).materialize()
            metrics["meta_resumed"] = False
            if checkpoint_dir and meta_key:
                save_meta_cache(checkpoint_dir, meta_key, "docs_meta",
                                docs)
                save_meta_cache(checkpoint_dir, meta_key, "membership",
                                membership)
    metrics["n_input"] = docs.count()

    rejects = docs.filter(expr="status != 'ok'")

    shuffle_bytes = {"exact_dedup_membership": membership.size_bytes()}
    reject_ids = rejects.select_columns(["doc_id"])
    removal, wf_stats = ed.removal_refs(membership, cfg,
                                        rejects_ids_ds=reject_ids)
    # winners (raw content) is consumed ONLY by the containment confirm
    # in the fused-fingerprint plan — it stays a lazy source-read chain
    winners = ed.apply_winner_filter(corpus, removal)
    exact_edge_ds = ed.exact_edges(membership)
    metrics.update(wf_stats)
    metrics["t_normalize_dedup"] = time.perf_counter() - t0

    # --- fingerprint (+ per-document incremental checkpoint/resume) ------
    t1 = time.perf_counter()
    if sig_wide is not None:
        # fused plan: signatures already computed in the single source
        # pass — drop meta columns and anti-filter losers/rejects with
        # the SAME removal refs the winner filter uses
        sig_view = sig_wide.select_columns(
            ["doc_id", "lang", "n_bytes"] + _SIG_EXTRA)
        signatures = ed.apply_winner_filter(sig_view,
                                            removal).materialize()
        # free the all-docs wide blocks before the band-emission sort:
        # every downstream consumer reads either `docs` (materialized
        # slim) or `signatures` (winners only) — never sig_wide again.
        # BOTH locals must go: sig_view is a lazy projection whose plan
        # holds the materialized block refs, so keeping it pinned the
        # whole ~28 GB wide table through the candidate sorts (at 20M
        # docs plasma filled with referenced blocks and every sort write
        # became a DISK fallback allocation — the 38 GB "phantom" disk
        # use that killed three stress runs was exactly this)
        del sig_wide, sig_view
    elif checkpoint_dir:
        from ..state.checkpoint import resume_signatures
        signatures, n_cached, n_delta = resume_signatures(
            winners, checkpoint_dir, cfg,
            lambda ds: fingerprint_dataset(ds, cfg),
            corpus_key=meta_key)
        metrics["signatures_resumed"] = n_cached > 0
        metrics["n_signatures_cached"] = n_cached
        metrics["signatures_fast_path"] = n_delta == -1
        signatures = signatures.materialize()
    else:
        # signatures feed LSH and are re-read by reports/queries: pin
        # them (small — content is already dropped).  With a
        # checkpoint_dir the parquet checkpoint plays this role.
        signatures = fingerprint_dataset(winners, cfg).materialize()
    metrics["t_fingerprint"] = time.perf_counter() - t1

    shuffle_bytes["signatures_pinned"] = signatures.size_bytes()

    # --- candidates + two-phase verification -----------------------------
    t2 = time.perf_counter()
    # RAW (pre-dedupe) pairs: the grid verify plan dedupes (a, b) inside
    # its cells — a pair's rows always share a cell — so the standalone
    # dedupe exchange + barrier is skipped on the scale path (round-4
    # floor work); the broadcast plan (tiny runs) still dedupes up front
    # inside verify_candidates.  n_candidates therefore counts RAW
    # emissions since round 4 (band/anchor multiplicity included).
    cand_pairs = lsh.candidate_pairs(
        signatures, cfg, dedupe=False,
        n_sig_rows=metrics["n_winners"]).materialize()
    metrics["n_candidates"] = cand_pairs.count()
    # same resolver candidate_pairs used — the recorded chunk count can
    # never diverge from the passes actually run
    metrics["cand_key_chunks"] = lsh.resolve_cand_chunks(
        cfg, metrics["n_winners"])
    # band/anchor emission is the one big streamed shuffle; an analytic
    # figure (rows x slim-row width) because the emitted stream is never
    # materialized — shares lsh's row-count/width constants so this
    # estimate and the chunk sizing agree by construction
    shuffle_bytes["lsh_emit_est"] = (
        metrics["n_winners"]
        * lsh.emission_rows_per_doc(cfg) * lsh.EMIT_ROW_BYTES)
    shuffle_bytes["pair_stream"] = cand_pairs.size_bytes()
    verified = lsh.verify_candidates(
        cand_pairs, signatures, cfg,
        n_pairs=metrics["n_candidates"],
        n_sig_rows=metrics["n_winners"],
        dedupe_in_cell=True).materialize()
    near = verified.filter(expr="kind == 'near'")
    cand = verified.filter(expr="kind == 'contain_cand'")
    if cfg.containment:
        # OVERLAP containment with connected components (round-3 scaling
        # work): the substring confirm and CC-over-(near ∪ exact) edges
        # have independent inputs, so both Ray jobs run concurrently from
        # two driver threads.  The contain edges are merged afterwards by
        # a second CC pass over (star edges of phase 1) ∪ (contain pairs)
        # — star edges preserve exactly the phase-1 connectivity and each
        # component's min-doc_id root, so the final parents are identical
        # to a single CC over the full edge set (min-root determinism,
        # SURVEY.md §7.4); when containment confirms nothing the phase-1
        # parents are already final and the second pass is skipped.
        import concurrent.futures as _cf
        near_edges = near.select_columns(["a", "b"]).union(exact_edge_ds)
        with _cf.ThreadPoolExecutor(max_workers=2) as ex:
            f_contain = ex.submit(
                lambda: vc.confirm_containment(cand, winners,
                                               cfg).materialize())
            f_parents = ex.submit(
                lambda: cluster_stage.connected_components(
                    near_edges,
                    small_graph_threshold=cfg.cc_small_graph_threshold,
                ).materialize())
            contain = f_contain.result()
            parents_phase1 = f_parents.result()
        pairs = (near.select_columns(lsh.PAIR_OUTPUT_COLUMNS)
                 .union(contain.select_columns(lsh.PAIR_OUTPUT_COLUMNS)))
        metrics["cc_overlapped"] = True
    else:
        contain = None
        parents_phase1 = None
        pairs = near.select_columns(lsh.PAIR_OUTPUT_COLUMNS)
    pairs = pairs.materialize()
    metrics["n_pairs"] = pairs.count()
    metrics["t_candidates_verify"] = time.perf_counter() - t2
    # phase-2 signature fetch ships (8 B id + num_perms x 8 B minhash) per
    # candidate doc — broadcast once under the cap, bucketed join above
    shuffle_bytes["verify_sig_fetch_est"] = (
        2 * metrics["n_candidates"] * (8 + 8 * cfg.num_perms))
    shuffle_bytes["verified_pairs"] = pairs.size_bytes()

    # --- clustering -------------------------------------------------------
    t3 = time.perf_counter()
    if parents_phase1 is not None:
        if contain.count() == 0:
            parents = parents_phase1
        else:
            def _star_as_edges(t: pa.Table) -> pa.Table:
                return pa.table({"a": t.column("doc_id"),
                                 "b": t.column("cluster_id")})

            star = parents_phase1.map_batches(_star_as_edges,
                                              batch_format="pyarrow")
            parents = cluster_stage.connected_components(
                star.union(contain.select_columns(["a", "b"])),
                small_graph_threshold=cfg.cc_small_graph_threshold,
            ).materialize()
    else:
        edges = pairs.select_columns(["a", "b"]).union(exact_edge_ds)
        parents = cluster_stage.connected_components(
            edges,
            small_graph_threshold=cfg.cc_small_graph_threshold).materialize()
    clusters = assign_clusters(docs, parents, cfg)
    shuffle_bytes["cc_edges_est"] = 16 * (metrics["n_pairs"]
                                          + metrics["n_losers"])
    metrics["shuffle_bytes"] = shuffle_bytes
    metrics["t_cluster"] = time.perf_counter() - t3
    metrics["t_total"] = time.perf_counter() - t0

    if checkpoint_dir:
        from ..state.checkpoint import write_lineage
        for stage in ("normalize_dedup", "fingerprint",
                      "candidates_verify", "cluster"):
            write_lineage(checkpoint_dir, stage, {
                "wall_sec": round(metrics.get(f"t_{stage}", 0.0), 3),
                "config_hash": cfg.signature_config_hash})
        write_lineage(checkpoint_dir, "summary", {
            k: v for k, v in metrics.items()
            if isinstance(v, (int, float, bool))})

    return DedupResult(docs=docs, winners=winners, signatures=signatures,
                       pairs=pairs, clusters=clusters, rejects=rejects,
                       metrics=metrics)


def rematch(corpus_ds, cfg: PipelineConfig, checkpoint_dir: str) -> DedupResult:
    """Threshold-recalibration fast path (reference entry point 3,
    ``mainwindow.cpp:110-121`` / SURVEY.md §3.3): fingerprints are
    threshold-independent, so a threshold/mode change skips the
    fingerprint stage entirely (signatures come from the checkpoint) and
    only match-time work reruns — the ">10x faster once cached" property
    (readme.md:35).  The cheap metadata pass still runs (it feeds exact
    edges and the cluster join).

    Requires a prior ``run_dedup(..., checkpoint_dir=...)`` with the same
    signature config; raises if the checkpoint is missing.
    """
    res = run_dedup(corpus_ds, cfg, checkpoint_dir=checkpoint_dir)
    if not res.metrics.get("signatures_resumed"):
        raise ValueError(
            "rematch() found no usable signature checkpoint under "
            f"{checkpoint_dir!r} — run run_dedup(checkpoint_dir=...) first")
    return res


def assign_clusters(docs_ds, parents_ds, cfg: PipelineConfig):
    """All OK docs -> (doc_id, cluster_id, n_bytes, cluster_size,
    is_canonical).

    Parent map joins by the cap-gated ``lookup_join`` (it only contains
    docs that have duplicates — broadcast below ``broadcast_cap``, one
    bucketed enrich shuffle above); singletons map to themselves.
    Canonical pick mirrors the FULL ``highlightBetterProperties`` ranking
    (``comparison.cpp:266-330``): size decides only beyond the ±100 kB
    tolerance (``comparison.cpp:270``, ``cfg.canonical_size_tolerance``);
    among members within tolerance of the cluster max, the earliest
    mtime wins (``comparison.cpp:310-318`` date ranking), then min
    doc_id — a pure reduction, deterministic under any execution order.
    """
    from ..state import bucketing as B
    from ..state.joins import filter_by_key_shards, sharded_key_refs

    ok = docs_ds.filter(expr="status == 'ok'")
    cols = ["doc_id", "n_bytes"]
    schema_names = docs_ds.schema().names or []
    has_mtime = "mtime" in schema_names
    if has_mtime:
        cols.append("mtime")
    slim = ok.select_columns(cols)
    tol = cfg.canonical_size_tolerance

    # ---- dup/singleton split (round-4 floor work) -----------------------
    # The canonical pick is a per-CLUSTER reduction, but singletons (the
    # overwhelming majority of a deduped corpus) are trivially canonical —
    # only docs touched by the parent map need the cluster_id shuffle.
    # Dup-involved ids = parents' members ∪ their roots (the map carries
    # only non-root members, stages/cluster.py contract); that set is
    # O(duplicates), so the bucketed canonical shuffle carries
    # ~n_dup_docs rows instead of the whole corpus.  THRESHOLD-GATED:
    # below ``assign_split_threshold`` docs the single full shuffle is
    # cheaper than the split's extra task waves (A/B at 500k/32:
    # 1.1-1.5 s single vs 1.6 s split); above it the corpus-sized
    # exchange dominates and the split wins.  Both paths emit identical
    # rows (the split is a partition of the same reduction).

    def _canonical_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Whole bucket of clusters at once, vectorized sort +
        first-of-group: eligible = within ``tol`` bytes of the cluster's
        max size; canonical = min (mtime, doc_id) among eligible."""
        df = df.copy()
        if "mtime" not in df.columns:
            df["mtime"] = np.int64(0)
        mx = df.groupby("cluster_id")["n_bytes"].transform("max")
        df["__inelig"] = (df["n_bytes"] < mx - tol)
        df = df.sort_values(["cluster_id", "__inelig", "mtime", "doc_id"],
                            ascending=True, kind="stable")
        df["cluster_size"] = df.groupby("cluster_id")["doc_id"] \
                               .transform("size").astype("int64")
        df["is_canonical"] = ~df.duplicated("cluster_id")
        out = df.drop(columns="__inelig")
        cols_out = ["doc_id", "n_bytes", "mtime", "cluster_id",
                    "cluster_size", "is_canonical"]
        return out[[c for c in cols_out if c in out.columns]]

    # ---- BROADCAST fast path (round-4 floor work, second cut) -----------
    # ``parents`` is O(duplicates): when members ∪ roots fit the broadcast
    # cap the whole assignment needs ZERO shuffles — stream-filter the
    # dup-involved rows (searchsorted against a broadcast sorted id array,
    # output is tiny by the cap), run the SAME per-cluster reduction once
    # on the collected frame, ``ray.put`` the per-doc verdict arrays, and
    # emit final rows in ONE streaming pass over the corpus (singletons
    # filled inline: self-cluster, size 1, canonical).  Replaces both the
    # full-corpus grouped_map (≤ threshold) and the sharded split (two
    # filter waves + bucketed shuffle) whenever the dup set is
    # broadcastable; identical rows by construction — the other paths are
    # partitions of the same reduction.
    n_parent = parents_ds.count()
    if 2 * n_parent <= cfg.broadcast_cap:
        pmap = parents_ds.to_pandas()
        # an empty parents dataset can collect to a frame with NO columns
        if "doc_id" in pmap.columns:
            member = pmap["doc_id"].to_numpy(dtype=np.int64)
            root = pmap["cluster_id"].to_numpy(dtype=np.int64)
        else:
            member = root = np.empty(0, np.int64)
        dup_sorted = np.unique(np.concatenate([member, root])) \
            if len(member) else np.empty(0, np.int64)
        dup_ref = ray.put(dup_sorted)

        def _dup_rows(t: pa.Table) -> pa.Table:
            arr = ray.get(dup_ref)
            if not len(arr) or not t.num_rows:
                return t.slice(0, 0)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(arr, ids).clip(0, len(arr) - 1)
            hit = arr[pos] == ids
            return t.take(pa.array(np.flatnonzero(hit), pa.int64()))

        dup_pd = slim.map_batches(_dup_rows,
                                  batch_format="pyarrow").to_pandas()
        if len(member):
            mo = np.argsort(member, kind="stable")
            ms, rs = member[mo], root[mo]
            ids = dup_pd["doc_id"].to_numpy(dtype=np.int64)
            if len(ids):
                p = np.searchsorted(ms, ids).clip(0, len(ms) - 1)
                hit = ms[p] == ids
                dup_pd["cluster_id"] = np.where(hit, rs[p], ids)
            else:
                dup_pd["cluster_id"] = np.empty(0, np.int64)
        else:
            dup_pd["cluster_id"] = dup_pd["doc_id"].to_numpy(
                dtype=np.int64) if len(dup_pd) else np.empty(0, np.int64)
        verdict = (_canonical_bucket(dup_pd) if len(dup_pd)
                   else None)
        if verdict is not None and len(verdict):
            v_ids = verdict["doc_id"].to_numpy(dtype=np.int64)
            vo = np.argsort(v_ids, kind="stable")
            v_pack = (v_ids[vo],
                      verdict["cluster_id"].to_numpy(dtype=np.int64)[vo],
                      verdict["cluster_size"].to_numpy(dtype=np.int64)[vo],
                      verdict["is_canonical"].to_numpy(dtype=bool)[vo])
        else:
            v_pack = (np.empty(0, np.int64), np.empty(0, np.int64),
                      np.empty(0, np.int64), np.empty(0, bool))
        v_ref = ray.put(v_pack)

        def _assign(t: pa.Table) -> pa.Table:
            v_ids, v_cid, v_size, v_canon = ray.get(v_ref)
            n = t.num_rows
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            if len(v_ids):
                p = np.searchsorted(v_ids, ids).clip(0, len(v_ids) - 1)
                hit = v_ids[p] == ids
                cid = np.where(hit, v_cid[p], ids).astype(np.int64)
                size = np.where(hit, v_size[p],
                                np.int64(1)).astype(np.int64)
                canon = np.where(hit, v_canon[p], True)
            else:
                cid = ids.astype(np.int64)
                size = np.ones(n, np.int64)
                canon = np.ones(n, bool)
            mt = (t.column("mtime") if "mtime" in t.column_names
                  else pa.array(np.zeros(n, np.int64), pa.int64()))
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_bytes": t.column("n_bytes"),
                "mtime": mt,
                "cluster_id": pa.array(cid, pa.int64()),
                "cluster_size": pa.array(size, pa.int64()),
                "is_canonical": pa.array(canon.astype(bool), pa.bool_()),
            })

        return slim.map_batches(_assign, batch_format="pyarrow")

    try:
        n_docs = docs_ds.count()
    except Exception:
        n_docs = None
    if n_docs is not None and n_docs <= cfg.assign_split_threshold:
        assigned = lookup_join(slim, "doc_id", parents_ds, "doc_id",
                               "cluster_id", "cluster_id", cfg)
        return B.grouped_map(assigned, "cluster_id", B.bucket_of_ints,
                             _canonical_bucket,
                             num_buckets=cfg.join_buckets,
                             batch_format="pandas")

    def _dup_ids(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pa.array(np.concatenate([
            t.column("doc_id").to_numpy(zero_copy_only=False),
            t.column("cluster_id").to_numpy(zero_copy_only=False)]),
            pa.int64())})

    dup_ids = parents_ds.map_batches(_dup_ids, batch_format="pyarrow")
    n_dup = dup_ids.count()
    buckets = 1 if n_dup <= cfg.broadcast_cap else cfg.join_buckets
    refs = sharded_key_refs(dup_ids, "doc_id", buckets)
    dup_rows = filter_by_key_shards(slim, "doc_id", refs)
    single_rows = filter_by_key_shards(slim, "doc_id", refs, invert=True)

    assigned = lookup_join(dup_rows, "doc_id", parents_ds, "doc_id",
                           "cluster_id", "cluster_id", cfg)

    dup_clusters = B.grouped_map(assigned, "cluster_id", B.bucket_of_ints,
                                 _canonical_bucket,
                                 num_buckets=cfg.join_buckets,
                                 batch_format="pandas")

    def _singleton(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t.column("doc_id")
        return pa.table({
            "doc_id": ids,
            "n_bytes": t.column("n_bytes"),
            "mtime": (t.column("mtime") if "mtime" in t.column_names
                      else pa.array(np.zeros(n, np.int64), pa.int64())),
            "cluster_id": ids,
            "cluster_size": pa.array(np.ones(n, np.int64), pa.int64()),
            "is_canonical": pa.array(np.ones(n, bool), pa.bool_()),
        })

    singles = single_rows.map_batches(_singleton, batch_format="pyarrow")
    return dup_clusters.union(singles)


def clusters_with_identity(res: DedupResult, cfg: PipelineConfig):
    """Join cluster verdicts back to identity columns (repo/path/commit) —
    the lookup-join analogue of the match dialog re-reading file info
    (``comparison.cpp:86,111``, SURVEY.md §2.5 J6).

    The parent side of the join is the clusters dataset keyed by doc_id;
    identity rides the docs dataset.  Cap-gated ``lookup_join``: broadcast
    of the (doc_id -> cluster_id) map below ``broadcast_cap``, bucketed
    enrich shuffle above it.
    """
    ok = (res.docs.filter(expr="status == 'ok'")
          .select_columns(["repo", "path", "commit", "lang", "doc_id",
                           "n_bytes", "sha256"]))
    return lookup_join(ok, "doc_id",
                       res.clusters.select_columns(["doc_id",
                                                    "cluster_id"]),
                       "doc_id", "cluster_id", "cluster_id", cfg)


def cluster_report(clusters_ds):
    """The ``reportMatchingVideos`` aggregate (``comparison.cpp:29-47``):
    docs having >= 1 duplicate, and reclaimable bytes = sum over clusters of
    (total bytes - kept canonical bytes).

    Pure per-batch partial sums — the clusters dataset already carries
    cluster_size/is_canonical, so no further shuffle is needed:
    reclaimable = sum of n_bytes over NON-canonical members of dup
    clusters (the canonical member is by construction the largest)."""
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df["cluster_size"] >= 2]
        return pd.DataFrame({
            "docs_with_dups": [len(dup)],
            "reclaimable_bytes": [int(
                dup.loc[~dup["is_canonical"], "n_bytes"].sum())],
            "clusters": [int(dup["is_canonical"].sum())],
        })

    per = clusters_ds.map_batches(_partial, batch_format="pandas")
    agg = per.sum(["docs_with_dups", "reclaimable_bytes", "clusters"])
    return {"docs_with_dups": int(agg["sum(docs_with_dups)"]),
            "reclaimable_bytes": int(agg["sum(reclaimable_bytes)"]),
            "dup_clusters": int(agg["sum(clusters)"])}

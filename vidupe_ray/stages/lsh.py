"""LSH candidate generation + two-phase verification — replaces the
reference's O(n^2) all-pairs sweep (``comparison.cpp:34-42``, ``101-126``)
with O(n * bands) band rows (SURVEY.md §2.5 J1), preserving the two-stage
cost pyramid of ``bothVideosMatch`` (``comparison.cpp:141-147``):

- phase 1 (inside the band shuffle, CHEAP): rows carry only fixed-width
  columns (doc_id, token/shingle counts, head/tail SimHash-64) — ~50 bytes
  per row instead of the 1 KiB MinHash signature, a 20x lighter shuffle.
  Within each bucket, pairs sharing a band key pass through the Hamming
  slot gate; in simhash mode (the pHash-mode analogue) the gate IS the
  final verdict.
- phase 2 (per candidate pair, RICH): the ~1000x smaller candidate-pair
  set fetches MinHash signatures by doc_id (broadcast of the id-filtered
  signature matrix; the small side by construction) and applies the
  Jaccard + length-modifier decision — the SSIM-stage analogue.

Candidate channels sharing the one bucketed shuffle:

- channel 0 (BAND): ``bands x rows_per_band`` MinHash banding; in simhash
  mode the same channel also carries SLOT SUB-BAND keys — each 64-bit
  head/tail slot split into ``slot_subbands`` equal sub-keys, so any pair
  within Hamming <= slot_subbands-1 of a slot shares a key (pigeonhole):
  the reference's low-Jaccard slot-distance matches (comparison.cpp:
  133-140) surface deterministically for d <= 3 at the default 4 x 16.
- channel 1 (ANCHOR): bottom-k distinct shingle hashes; docs sharing an
  anchor with a >= ``min_containment_ratio`` size gap become containment
  candidates for the substring pass (north rule); phase 2 prunes them by
  the MinHash containment estimate before the exact confirm.

Skew: keys shuffle as ``hash(key) % num_buckets`` with vectorized
per-bucket group processing (state/bucketing.py); groups larger than
``band_group_cap`` switch to sorted ring-linking keeping ~cap^2
comparisons (connectivity survives; capped groups carried in
``group_size`` — never silent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import PipelineConfig
from ..functions import hashing as H
from ..functions import similarity as S
from ..state import bucketing as B

_ANCHOR_CHANNEL_SALT = H.U64(0xA17C_0FFE_E125_9EA1)
_SLOT_HEAD_SALT = H.U64(0x51DE_C0DE_0000_0001)
_SLOT_TAIL_SALT = H.U64(0x51DE_C0DE_0000_0002)

PAIR_SCHEMA = pa.schema([
    ("a", pa.int64()), ("b", pa.int64()),
    ("jaccard", pa.float64()), ("hamming", pa.int32()),
    ("best_sim", pa.int32()), ("kind", pa.string()),
    ("group_size", pa.int32()),
    # phase-1 -> phase-2 carry: the length modifier and both sides'
    # shingle counts (a-side = smaller doc_id)
    ("modifier", pa.int32()),
    ("nsh_a", pa.int32()), ("nsh_b", pa.int32()),
])

PAIR_OUTPUT_COLUMNS = ["a", "b", "jaccard", "hamming", "best_sim", "kind",
                       "group_size"]


def _empty_pairs() -> pa.Table:
    return PAIR_SCHEMA.empty_table()


def _as_array(col) -> pa.Array:
    """ChunkedArray -> Array (post-shuffle tables are often multi-chunk)."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def fsl_matrix(table: pa.Table, name: str, width: int) -> np.ndarray:
    """fixed_size_list<uint64, width> column -> (n, width) uint64 matrix."""
    arr = _as_array(table.column(name))
    flat = arr.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), width).astype(H.U64, copy=False)


class BandEmitter:
    """map_batches callable: signatures -> slim candidate key rows
    (~``bands`` band rows + <= ``anchor_k`` anchor rows per doc).

    ``key_chunk=(c, C)`` keeps only rows whose key falls in chunk c of a
    C-way split of the key space (``key % C == c``; keys are mix64
    outputs, so the split is uniform).  Dropped rows are filtered BEFORE
    the payload ``take`` — a chunked pass materializes only its own
    1/C of the emission."""

    def __init__(self, cfg: PipelineConfig,
                 key_chunk: tuple[int, int] | None = None):
        self.cfg = cfg
        self.key_chunk = key_chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return self._empty()
        low = batch.column("low_content").to_numpy(zero_copy_only=False)
        mh = fsl_matrix(batch, "minhash", cfg.num_perms)

        live = np.flatnonzero(~low)
        bh = H.band_hashes(mh[live], cfg.bands, cfg.rows_per_band, cfg.seed)
        band_idx = np.repeat(live, cfg.bands)
        band_keys = bh.reshape(-1)

        anchors = _as_array(batch.column("anchors"))
        a_offsets = anchors.offsets.to_numpy(zero_copy_only=False)
        a_values = anchors.values.to_numpy(zero_copy_only=False).astype(H.U64)
        a_counts = np.diff(a_offsets)
        anchor_idx = np.repeat(np.arange(n), a_counts)
        anchor_keys = H.mix64(a_values ^ _ANCHOR_CHANNEL_SALT)

        idx_parts = [band_idx, anchor_idx]
        key_parts = [band_keys, anchor_keys]
        chan_parts = [np.zeros(len(band_idx), dtype=np.uint8),
                      np.ones(len(anchor_idx), dtype=np.uint8)]
        if cfg.mode == "simhash":
            # pHash-mode extra channel: SLOT SUB-BAND keys.  The reference
            # matches any pair whose begin- or end-hash is within Hamming
            # distance of the threshold regardless of whole-doc similarity
            # (comparison.cpp:133-140); MinHash bands cannot generate
            # low-Jaccard candidates.  Each 64-bit slot is banded into
            # ``slot_subbands`` equal-width sub-keys: d differing bits can
            # spoil at most d sub-keys, so any pair at slot distance
            # <= slot_subbands-1 (d<=3 at the default 4 x 16-bit) shares
            # at least one identical sub-key — deterministic coverage of
            # the reference's d>0 low-Jaccard semantic (VERDICT r2 #1).
            # Random 16-bit collisions are pruned in-bucket by the exact
            # slot gate before anything reaches the pair shuffle.
            head_v = batch.column("simhash_head").to_numpy(
                zero_copy_only=False).astype(H.U64)[live]
            tail_v = batch.column("simhash_tail").to_numpy(
                zero_copy_only=False).astype(H.U64)[live]
            nsub = cfg.slot_subbands
            width = 64 // nsub
            sub_mask = H.U64((1 << width) - 1)
            for slot_v, salt in ((head_v, _SLOT_HEAD_SALT),
                                 (tail_v, _SLOT_TAIL_SALT)):
                valid = slot_v != H.U64(0)     # 0 = invalid-slot sentinel
                vidx = live[valid]
                sv = slot_v[valid]
                for i in range(nsub):
                    sub = (sv >> H.U64(width * i)) & sub_mask
                    # (sub, i) packed pre-mix -> unique key per sub-band
                    # (sub-band index fits 6 bits for any nsub <= 64);
                    # salt separates head/tail keyspaces
                    key = H.mix64(((sub << H.U64(6)) | H.U64(i)) ^ salt)
                    idx_parts.append(vidx)
                    key_parts.append(key)
                    chan_parts.append(np.zeros(len(vidx), dtype=np.uint8))
        idx = np.concatenate(idx_parts)
        keys = np.concatenate(key_parts).view(np.int64)
        channel = np.concatenate(chan_parts)
        if self.key_chunk is not None:
            c, nchunks = self.key_chunk
            m = (keys.view(H.U64) % H.U64(nchunks)) == H.U64(c)
            idx, keys, channel = idx[m], keys[m], channel[m]

        payload = batch.select(["doc_id", "n_tokens", "n_shingles",
                                "simhash_head", "simhash_tail"])
        out = payload.take(pa.array(idx, pa.int64()))
        out = out.append_column("key", pa.array(keys, pa.int64()))
        out = out.append_column("channel", pa.array(channel, pa.uint8()))
        return out

    def _empty(self) -> pa.Table:
        return pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("n_shingles", pa.int64()), ("simhash_head", pa.uint64()),
            ("simhash_tail", pa.uint64()),
            ("key", pa.int64()), ("channel", pa.uint8()),
        ]).empty_table()


class BucketVerifier:
    """Phase 1, one call per BUCKET (thousands of key-groups), vectorized:
    sort by (key, n_shingles, doc_id), find key segments, generate all
    within-segment pairs, apply the Hamming slot gate / the containment
    ratio+guard filters."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, bucket: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = bucket.num_rows
        if n < 2:
            return _empty_pairs()
        key = bucket.column("key").to_numpy(zero_copy_only=False)
        doc_id = bucket.column("doc_id").to_numpy(zero_copy_only=False)
        nsh = bucket.column("n_shingles").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc_id, nsh, key))
        key = key[order]
        doc_id = doc_id[order]
        nsh = nsh[order]
        ntok = bucket.column("n_tokens").to_numpy(zero_copy_only=False)[order]
        chan = bucket.column("channel").to_numpy(zero_copy_only=False)[order]
        head = bucket.column("simhash_head").to_numpy(
            zero_copy_only=False).astype(H.U64)[order]
        tail = bucket.column("simhash_tail").to_numpy(
            zero_copy_only=False).astype(H.U64)[order]

        offsets = B.segment_boundaries(key)
        seg_chan = chan[offsets[:-1]]
        band_off = _filter_offsets(offsets, seg_chan == 0)
        anch_off = _filter_offsets(offsets, seg_chan == 1)

        tables = []
        # ---- band channel: Hamming slot gate ----------------------------
        i_idx, j_idx, _ = B.segment_pairs(band_off, cfg.band_group_cap,
                                          strategy=cfg.hot_group_strategy,
                                          salt_ids=doc_id)
        if len(i_idx):
            gsz = _pair_group_sizes(band_off, i_idx)
            r = S.slot_gate(head[i_idx], head[j_idx],
                            tail[i_idx], tail[j_idx],
                            ntok[i_idx], ntok[j_idx], cfg)
            keep = r["gate"] & (doc_id[i_idx] != doc_id[j_idx])
            kind = "near" if cfg.mode == "simhash" else "near_cand"
            tables.append(_pairs_table(
                doc_id, nsh, i_idx[keep], j_idx[keep],
                r["hamming"][keep], r["best_sim"][keep],
                r["modifier"][keep], kind, gsz[keep]))
        # ---- anchor channel: containment candidates ---------------------
        # hot-anchor skip: see cfg.hot_anchor_cap
        sizes = anch_off[:, 1] - anch_off[:, 0]
        anch_off = anch_off[sizes <= cfg.hot_anchor_cap]
        i_idx, j_idx, _ = B.segment_pairs(anch_off, cfg.band_group_cap,
                                          strategy=cfg.hot_group_strategy,
                                          salt_ids=doc_id)
        if len(i_idx):
            gsz = _pair_group_sizes(anch_off, i_idx)
            # rows are size-sorted within segments: i = smaller side
            ratio_ok = nsh[j_idx] >= cfg.min_containment_ratio * nsh[i_idx]
            guard = nsh[i_idx] >= cfg.min_shingles
            keep = ratio_ok & guard & (doc_id[i_idx] != doc_id[j_idx])
            nk = int(keep.sum())
            tables.append(_pairs_table(
                doc_id, nsh, i_idx[keep], j_idx[keep],
                np.full(nk, 64, dtype=np.int64),
                np.zeros(nk, dtype=np.int64),
                np.zeros(nk, dtype=np.int64), "contain_cand",
                gsz[keep]))
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return _empty_pairs()
        return pa.concat_tables(tables)


def _filter_offsets(offsets: np.ndarray, seg_mask: np.ndarray) -> np.ndarray:
    starts = offsets[:-1][seg_mask]
    ends = offsets[1:][seg_mask]
    return np.stack([starts, ends], axis=1)


def _pair_group_sizes(seg_off, i_idx):
    starts = seg_off[:, 0]
    sizes = (seg_off[:, 1] - seg_off[:, 0]).astype(np.int32)
    seg_of = np.searchsorted(starts, i_idx, side="right") - 1
    return sizes[seg_of]


def _pairs_table(doc_id, nsh, i_k, j_k, hamming, best_sim, modifier, kind,
                 group_size) -> pa.Table:
    if len(i_k) == 0:
        return _empty_pairs()
    swap = doc_id[i_k] > doc_id[j_k]
    a_i = np.where(swap, j_k, i_k)
    b_i = np.where(swap, i_k, j_k)
    return pa.table({
        "a": pa.array(doc_id[a_i], pa.int64()),
        "b": pa.array(doc_id[b_i], pa.int64()),
        "jaccard": pa.array(np.full(len(i_k), -1.0), pa.float64()),
        "hamming": pa.array(np.asarray(hamming).astype(np.int32), pa.int32()),
        "best_sim": pa.array(np.asarray(best_sim).astype(np.int32),
                             pa.int32()),
        "kind": pa.array([kind] * len(i_k), pa.string()),
        "group_size": pa.array(np.asarray(group_size).astype(np.int32),
                               pa.int32()),
        "modifier": pa.array(np.asarray(modifier).astype(np.int32),
                             pa.int32()),
        "nsh_a": pa.array(nsh[a_i].astype(np.int32), pa.int32()),
        "nsh_b": pa.array(nsh[b_i].astype(np.int32), pa.int32()),
    })


def _dedupe_pair_frame(df: pd.DataFrame) -> pd.DataFrame:
    """One row per (a, b): prefer near/near_cand rows over contain_cand
    (the anchor-channel twin of a band-channel pair loses)."""
    pri = (df["kind"] == "contain_cand").astype(np.int8)
    df = df.assign(__pri=pri).sort_values(
        ["a", "b", "__pri"], kind="stable")
    df = df.drop_duplicates(["a", "b"], keep="first")
    return df.drop(columns="__pri")


def dedupe_pairs(pairs_ds, num_buckets: int = 64):
    """Global (a, b) dedupe of a raw pair stream — one bucketed shuffle
    keyed by the mixed pair hash.  The broadcast verify plan needs this
    up front; the grid plan dedupes inside its cells instead (a pair's
    rows always share a cell), saving this whole exchange
    (``verify_candidates(dedupe_in_cell=True)``, round-4 floor work)."""
    def _pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).view(H.U64)
        bb = batch.column("b").to_numpy(zero_copy_only=False).view(H.U64)
        pk = H.mix64(a * H.U64(0x9E3779B97F4A7C15) ^ bb).view(np.int64)
        return batch.append_column("pair_key", pa.array(pk, pa.int64()))

    keyed = pairs_ds.map_batches(_pair_bucket, batch_format="pyarrow")
    return B.grouped_map(
        keyed, "pair_key", B.bucket_of_ints,
        lambda df: _dedupe_pair_frame(df).drop(columns="pair_key"),
        num_buckets=num_buckets, batch_format="pandas")


def emission_rows_per_doc(cfg: PipelineConfig) -> int:
    """Upper bound on slim candidate-key rows one doc emits (bands +
    anchors + simhash-mode slot sub-band keys)."""
    extra = 2 * cfg.slot_subbands if cfg.mode == "simhash" else 0
    return cfg.bands + cfg.anchor_k + extra


#: bytes per slim emission row (doc_id + n_tokens + n_shingles + 2 slots
#: + key = 6 x 8 B, + channel 1 B)
EMIT_ROW_BYTES = 49

#: hard cap on sequential candidate passes — each pass re-reads the
#: pinned signatures, so a runaway chunk count (absurd explicit config /
#: tiny budget) degrades to O(chunks) full scans; 256 passes x 8 GiB
#: budget covers a 2 TiB emission (~40B docs) before the cap binds
_MAX_CAND_CHUNKS = 256


def resolve_cand_chunks(cfg: PipelineConfig, n_sig_rows: int) -> int:
    """Single source of truth for the candidate-pass chunk count.

    Used by both :func:`candidate_pairs` (to run the passes) and the
    flagship's metrics (`pipelines/dedup.py`) so the recorded
    ``cand_key_chunks`` can never diverge from the count actually run.
    Explicit ``cfg.cand_key_chunks`` wins; otherwise the estimated slim
    emission (rows x :func:`emission_rows_per_doc` x ``EMIT_ROW_BYTES``)
    is ceil-divided by ``cfg.cand_emit_budget``.  Both routes clamp to
    ``_MAX_CAND_CHUNKS``.
    """
    if cfg.cand_key_chunks > 0:
        return min(cfg.cand_key_chunks, _MAX_CAND_CHUNKS)
    if cfg.cand_emit_budget <= 0:
        raise ValueError(
            f"cand_emit_budget must be > 0 (got {cfg.cand_emit_budget})")
    est = n_sig_rows * emission_rows_per_doc(cfg) * EMIT_ROW_BYTES
    return min(max(1, -(-est // cfg.cand_emit_budget)), _MAX_CAND_CHUNKS)


def candidate_pairs(signatures_ds, cfg: PipelineConfig,
                    num_buckets: int = 64, dedupe: bool = True,
                    n_sig_rows: int | None = None):
    """signatures -> phase-1 pair dataset (both channels).

    One slim emission, one bucketed shuffle + vectorized gate, and (by
    default) one bucketed dedupe over tiny pair rows.  Pass
    ``dedupe=False`` when the consumer dedupes itself — the grid verify
    plan does it inside its cells, so the flagship skips this exchange
    entirely (one fewer all-to-all + materialization barrier).

    **Bounded exchange volume (scale plan):** Ray's sort shuffle
    materializes the whole emission (~rows x bands+anchors x 49 B) plus
    a shuffled copy — at 20M docs that is ~2 x 27 GB on top of the 20 GB
    pinned signature table, which overflowed a 76 GiB store into a
    disk-full spill.  When the estimated emission exceeds
    ``cfg.cand_emit_budget`` the key space is split into
    ``ceil(est / budget)`` disjoint chunks (``key % C == c``; keys are
    mix64 outputs so the split is uniform) and each chunk runs
    emit->shuffle->gate as its OWN sequential pass, so in-flight volume
    is capped at ~2 x budget regardless of corpus size.  A key's whole
    segment lands in exactly one chunk, so the union of per-chunk pair
    outputs is identical to the single pass — re-reading the
    (materialized, zero-copy) signatures C times and re-hashing bands is
    the only extra cost.  Cross-chunk (a, b) twins (same pair via band
    keys in different chunks) are deduped exactly where single-pass
    cross-BUCKET twins already are: ``dedupe_pairs`` here or in-cell in
    the grid verify.
    """
    n = n_sig_rows if n_sig_rows is not None else signatures_ds.count()
    chunks = resolve_cand_chunks(cfg, n)

    verifier = BucketVerifier(cfg)

    def one_pass(key_chunk):
        emitted = signatures_ds.map_batches(
            BandEmitter(cfg, key_chunk=key_chunk),
            batch_format="pyarrow", batch_size=cfg.batch_size)
        return B.grouped_map(emitted, "key", B.bucket_of_ints,
                             lambda t: verifier(t),
                             num_buckets=num_buckets,
                             batch_format="pyarrow")

    if chunks == 1:
        pairs = one_pass(None)
    else:
        # sequential passes: materializing each chunk's (tiny) pair
        # output before starting the next is what bounds peak store use.
        # An unpopulated chunk (tiny corpus + explicit chunks>1) yields an
        # empty dataset still carrying the slim EMISSION schema — apply_fn
        # never ran — so empty parts are dropped before the union rather
        # than poisoning it with a mixed schema.
        parts = [one_pass((c, chunks)).materialize()
                 for c in range(chunks)]
        parts = [p for p in parts if p.count()]
        if not parts:
            pairs = ray.data.from_arrow(_empty_pairs())
        elif len(parts) == 1:
            pairs = parts[0]
        else:
            pairs = parts[0].union(*parts[1:])
    if not dedupe:
        return pairs
    return dedupe_pairs(pairs, num_buckets)


def pair_id_ds(pairs_ds, cols=("a", "b")):
    """Flatten pair endpoints into a single ``doc_id`` column dataset
    (feeds ``sharded_key_refs`` — the candidate id set never needs to be
    collected on the driver)."""
    cols = list(cols)

    def _ids(t: pa.Table) -> pa.Table:
        parts = [t.column(c).to_numpy(zero_copy_only=False) for c in cols]
        return pa.table({"doc_id": pa.array(np.concatenate(parts)
                                            if parts else
                                            np.empty(0, np.int64),
                                            pa.int64())})

    return pairs_ds.select_columns(cols).map_batches(
        _ids, batch_format="pyarrow")


def apply_pair_decision(batch: pa.Table, jac: np.ndarray,
                        cfg: PipelineConfig) -> pa.Table:
    """The phase-2 verdict shared by the broadcast and bucketed join paths:
    Jaccard + length-modifier decision (``comparison.cpp:144-147``) plus
    the containment-estimate pruning and the near->contain demotion."""
    kind = np.asarray(batch.column("kind").to_pylist())
    mod = batch.column("modifier").to_numpy(zero_copy_only=False)
    keep = kind == "near"                # simhash mode: already decided
    out_kind = kind.copy()

    nsh_a = batch.column("nsh_a").to_numpy(zero_copy_only=False)
    nsh_b = batch.column("nsh_b").to_numpy(zero_copy_only=False)
    nsh_sm = np.minimum(nsh_a, nsh_b)
    nsh_bg = np.maximum(nsh_a, nsh_b)
    est = S.containment_estimate(jac, nsh_a, nsh_b)
    contain_ok = ((nsh_bg >= cfg.min_containment_ratio * nsh_sm)
                  & (nsh_sm >= cfg.min_shingles)
                  & (est >= cfg.containment_est_floor))

    nc = kind == "near_cand"
    if nc.any():
        dec = S.jaccard_decision(jac, mod, cfg)
        keep = keep | (nc & dec)
        out_kind = np.where(nc & dec, "near", out_kind)
        # a gate-passing pair that fails the Jaccard decision may still
        # be a containment duplicate (truncated/embedded docs): route it
        # to the substring confirm — dedupe dropped its anchor-channel
        # twin in favor of this row
        demote = nc & ~dec & contain_ok
        keep = keep | demote
        out_kind = np.where(demote, "contain_cand", out_kind)

    cc = kind == "contain_cand"
    if cc.any():
        keep = keep | (cc & contain_ok)
    t = batch.set_column(batch.schema.get_field_index("jaccard"),
                         "jaccard", pa.array(jac, pa.float64()))
    t = t.set_column(t.schema.get_field_index("kind"), "kind",
                     pa.array(out_kind, pa.string()))
    return t.filter(pa.array(keep))


def verify_candidates(pairs_ds, signatures_ds, cfg: PipelineConfig,
                      n_pairs: int | None = None,
                      n_sig_rows: int | None = None,
                      dedupe_in_cell: bool = False):
    # n_sig_rows is accepted for call-site symmetry but unused: the
    # candidate-id subset measured faster at every scale tried (see the
    # grid-branch comment)
    """Phase 2: fetch MinHash signatures for candidate doc ids only and
    apply the Jaccard + length-modifier decision (the SSIM-stage analogue,
    ``comparison.cpp:144-147``) plus the containment-estimate pruning.

    Two equivalent join plans, cap-gated on the candidate id count (the
    reference streams all input sizes, ``comparison.cpp:101-126`` — so
    must we):

    - BROADCAST (id count <= ``broadcast_cap``): the id-filtered signature
      matrix is ``ray.put`` once and probed per pair batch — the 'small
      side broadcast' pattern.
    - BUCKETED (above the cap): signatures are id-filtered IN PLACE
      (sharded key refs — no driver materialization), then joined onto the
      pair rows by two ``bucketed_enrich`` shuffles (a-side, b-side); only
      candidate signatures ever cross the wire.

    Returns a dataset of verified 'near' pairs and surviving
    'contain_cand' pairs (for the substring confirm).
    """
    from ..state.joins import filter_by_key_shards, sharded_key_refs
    import ray.data as rd
    if n_pairs is None:
        n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return rd.from_arrow(_empty_pairs())

    if 2 * n_pairs > min(cfg.broadcast_cap, cfg.verify_grid_floor):
        # ---- grid signature join (the 100x-scale path) ------------------
        # Only the SLIM pair rows shuffle (into a k x k cell grid);
        # candidate signatures are sharded once by builder tasks and read
        # zero-copy per cell (state/joins.grid_pair_apply) — the 1 KiB
        # signatures never ride a sort shuffle.
        from ..state.joins import grid_pair_apply
        # The candidate-id subset costs three task waves (key shard
        # builders, per-bucket merges, the filter scan) but always pays:
        # unique candidate ids run far below pair-endpoint mentions
        # (500k-doc bench: 193k unique ids vs 735k mentions over 429k
        # rows), so the grid builders shard ~2x less payload and each
        # cell reads ~2x less.  Skipping the subset when mentions>=rows
        # was tried and measured SLOWER (interleaved best-of-4 at 32
        # CPUs: 2.5 s subset vs 5.8 s direct) — kept unconditional.
        refs = sharded_key_refs(pair_id_ds(pairs_ds), "doc_id",
                                cfg.join_buckets)
        sig_sub = filter_by_key_shards(
            signatures_ds.select_columns(["doc_id", "minhash"]),
            "doc_id", refs)

        def _verify_cell(cell: pa.Table, sa, sb) -> pa.Table:
            if cell.num_rows == 0 or sa[1] is None or sb[1] is None:
                return _empty_pairs()
            if dedupe_in_cell:
                # global (a,b) dedupe is exact here: the cell key is a
                # pure function of (a,b), so every row of a pair lands
                # in this cell — the upstream dedupe shuffle is skipped
                cell = pa.Table.from_pandas(
                    _dedupe_pair_frame(cell.to_pandas()),
                    preserve_index=False).cast(cell.schema)
            ids_a, tbl_a = sa
            ids_b, tbl_b = sb
            a = cell.column("a").to_numpy(zero_copy_only=False)
            b_ = cell.column("b").to_numpy(zero_copy_only=False)
            ia = np.minimum(np.searchsorted(ids_a, a), len(ids_a) - 1)
            ib = np.minimum(np.searchsorted(ids_b, b_), len(ids_b) - 1)
            hit = (ids_a[ia] == a) & (ids_b[ib] == b_)
            if not hit.all():        # defensive: every candidate id must
                cell = cell.filter(pa.array(hit))   # have a signature
                ia, ib = ia[hit], ib[hit]
            mh_a = fsl_matrix(tbl_a, "minhash", cfg.num_perms)[ia]
            mh_b = fsl_matrix(tbl_b, "minhash", cfg.num_perms)[ib]
            jac = S.jaccard_from_minhash(mh_a, mh_b)
            return apply_pair_decision(cell, jac, cfg)

        return grid_pair_apply(pairs_ds, sig_sub, _verify_cell,
                               k=cfg.grid_k)

    # ---- broadcast signature fetch (the fast path under the cap) --------
    if dedupe_in_cell:
        # no grid cells to dedupe in — run the explicit dedupe exchange
        # (small data by definition of this branch)
        pairs_ds = dedupe_pairs(pairs_ds).materialize()
    from .verify_contain import collect_ids
    ids = collect_ids(pairs_ds)
    if len(ids) == 0:
        return rd.from_arrow(_empty_pairs())
    ids_sorted = np.sort(ids)
    want_ref = ray.put(ids_sorted)

    def _grab(batch: pa.Table) -> pa.Table:
        want = ray.get(want_ref)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(want, d), len(want) - 1)
        return batch.select(["doc_id", "minhash"]).filter(
            pa.array(want[pos] == d))

    from ..state.joins import build_broadcast
    sub = signatures_ds.map_batches(_grab, batch_format="pyarrow")

    def _build_probe(tables):
        id_parts, mh_parts = [], []
        for b in tables:
            if b.num_rows == 0:
                continue
            id_parts.append(b.column("doc_id").to_numpy(
                zero_copy_only=False))
            mh_parts.append(fsl_matrix(b, "minhash", cfg.num_perms))
        ids_ = (np.concatenate(id_parts) if id_parts
                else np.empty(0, np.int64))
        mh = (np.concatenate(mh_parts, axis=0) if mh_parts
              else np.empty((0, cfg.num_perms), H.U64))
        order = np.argsort(ids_, kind="stable")
        return ids_[order], mh[order]

    sig_ref = build_broadcast(sub, _build_probe)

    def _verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        sig_ids, sig_mh = ray.get(sig_ref)
        if len(sig_ids) == 0:
            return batch.slice(0, 0)
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b_ = batch.column("b").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(sig_ids, a)
        ib = np.searchsorted(sig_ids, b_)
        jac = S.jaccard_from_minhash(sig_mh[ia], sig_mh[ib])
        return apply_pair_decision(batch, jac, cfg)

    return pairs_ds.map_batches(_verify, batch_format="pyarrow")

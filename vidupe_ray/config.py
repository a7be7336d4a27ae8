"""Pipeline configuration.

The Ray-Data analogue of Vidupe's ``Prefs`` (reference ``prefs.h:7-24``): a
single frozen config object carried to every stage (actor ``__init__`` args),
instead of a mutable GUI-bound preference singleton.

Default values mirror the reference defaults:

- ``threshold_pct = 89``  — GUI slider default (``mainwindow.ui:259-260``);
  maps to ``threshold_bits = round(64 * 89/100) = 57``
  (``mainwindow.cpp:110-114``) and ``threshold_frac = 0.89``
  (``prefs.h:19-20``).
- ``same_len_bonus = 1`` / ``diff_len_penalty = 4`` — the duration modifiers
  ``_sameDurationModifier`` / ``_differentDurationModifier``
  (``prefs.h:22-23``): near-equal lengths loosen the match by 1 bit-of-64,
  different lengths tighten it by 4.
- ``mode`` — ``"simhash"`` is the pHash-mode analogue (Hamming similarity
  alone decides, ``comparison.cpp:137-140``); ``"jaccard"`` is the SSIM-mode
  analogue (Hamming gate at ``max(threshold_bits, 44)`` then the richer
  Jaccard estimate decides, ``comparison.cpp:141-148``).  Default ``jaccard``:
  the engine's headline semantics use both the cheap and the rich signature,
  per the two-stage cost pyramid of the reference.
- head/tail SimHash slots are the CutEnds analogue (``thumbnail.h:26``,
  ``prefs.h:15``): two fingerprints per doc, match takes the best slot
  (``comparison.cpp:133-151``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- shingling / signatures ------------------------------------------
    shingle_k: int = 7            # tokens per shingle
    tokenizer: str = "bytes"      # "bytes" (vectorized byte-level \w runs,
                                  # no Python strings in the hot path) |
                                  # "regex" (\w+ via re, reference python path)
    num_perms: int = 128          # MinHash signature width (bins for oph)
    minhash_scheme: str = "oph"   # "oph" (one-permutation + densification,
                                  # one pass over shingles) | "kperm"
                                  # (classic 128 independent permutations)
    bands: int = 16               # LSH bands
    rows_per_band: int = 8        # bands * rows_per_band == num_perms
    simhash_bits: int = 64        # fixed: one uint64 per slot
    head_tail_window: int = 64    # shingles per head/tail SimHash slot (CutEnds analogue)
    min_shingles: int = 8         # low-content guard (monochrome-reject analogue,
                                  # reference video.cpp:203-211: hash := 0)

    # --- matching --------------------------------------------------------
    mode: str = "jaccard"         # "simhash" (pHash analogue) | "jaccard" (SSIM analogue)
    slot_subbands: int = 4        # simhash-mode candidate channel: each
                                  # 64-bit head/tail slot is banded into
                                  # this many equal sub-keys (4 x 16 bit);
                                  # pigeonhole guarantees any pair within
                                  # Hamming <= slot_subbands-1 of a slot
                                  # shares >= 1 sub-key — the reference
                                  # matches low-Jaccard pairs on slot
                                  # distance alone (comparison.cpp:133-140),
                                  # which MinHash bands cannot surface.
                                  # d >= slot_subbands pairs still surface
                                  # via MinHash bands when Jaccard is high;
                                  # the remaining (low-J, 4<=d<=8) corner
                                  # is the documented recall envelope —
                                  # raise to 8 (8 x 8-bit keys, d<=7
                                  # deterministic) to close it at a
                                  # candidate-noise cost.
    threshold_pct: int = 89       # slider percent; see threshold_bits/threshold_frac
    same_len_bonus: int = 1       # bits-of-64 when lengths are "the same"
    diff_len_penalty: int = 4     # bits-of-64 otherwise
    len_tolerance: float = 0.02   # relative n_tokens difference treated as same length
    ssim_gate_floor: int = 44     # jaccard mode gate = max(threshold_bits, 44)
                                  # (comparison.cpp:142)

    # --- canonical pick ---------------------------------------------------
    canonical_size_tolerance: int = 100_000  # bytes within which two sizes
                                  # count as "the same" when ranking the
                                  # kept copy — the reference's ±100 kB
                                  # tolerance (comparison.cpp:270); within
                                  # tolerance of the cluster max, the
                                  # earliest mtime (then min doc_id) wins
                                  # (comparison.cpp:266-330 ranking order)

    # --- containment / substring pass (north-rule addition) --------------
    containment: bool = True
    containment_est_floor: float = 0.5   # soft pre-filter on the MinHash
                                         # containment estimate before the
                                         # exact substring confirm (true
                                         # containments measured >= 0.65;
                                         # anchor-collision noise ~0.1-0.4)
    anchor_k: int = 12                   # bottom-k shingle hashes emitted as anchor keys
    hot_anchor_cap: int = 64             # anchor groups larger than this are
                                         # boilerplate shingles (license text,
                                         # generated headers) and are skipped:
                                         # quadratic pair emission for noise,
                                         # while true containment pairs stay
                                         # reachable through their other k-1
                                         # anchors (measured: 97% of 500k-doc
                                         # candidates came from such groups)
    min_containment_ratio: float = 1.10  # only consider containment when sizes differ
                                         # by at least this factor (else near-dup path covers it)

    # --- skew / scale knobs ----------------------------------------------
    band_group_cap: int = 256     # max docs verified all-pairs within one LSH/anchor
                                  # bucket; larger groups fall back to the
                                  # hot_group_strategy (explicit skew handling;
                                  # drops are logged, never silent)
    hot_group_strategy: str = "salt"  # "salt" (SURVEY §2.5 J1, default: split the
                                  # group by hash(doc_id) into ~cap-sized salt
                                  # subgroups, all-pairs within each + cross-salt
                                  # sampling — ~g*cap comparisons; measured
                                  # pair-level recall 0.44 vs ring's 0.12 on a
                                  # 120-member hot group at cap=16, identical
                                  # clusters) | "ring" (sorted ring-linking,
                                  # ~cap^2 comparisons/group — the cheaper
                                  # fallback when pair enumeration inside hot
                                  # groups doesn't matter)
    broadcast_cap: int = 2_000_000  # max ids for driver-side broadcast joins; above
                                    # this the bucketed shuffle join path is used
    broadcast_bytes_cap: int = 1 << 30  # max cumulative payload bytes for a
                                    # content broadcast (the id cap bounds COUNT;
                                    # large documents hit this first and switch
                                    # to the bucketed content join)
    join_buckets: int = 64        # buckets for the partitioned hash join fallback
    grid_k: int = 8               # grid side for the two-key pair joins (k^2
                                  # cells; payload read per cell =
                                  # |candidates| / k per side, slim pair rows
                                  # are the only shuffled bytes)
    verify_grid_floor: int = 200_000  # candidate-id count above which phase-2
                                  # verification uses the grid join even under
                                  # broadcast_cap — measured FASTER than the
                                  # broadcast probe at 500k docs (2.9 vs 3.7 s
                                  # @ 8 cpus, 4.0 vs 6.7 s @ 32: parallel
                                  # shard builders beat the single-task probe
                                  # build); tiny runs keep the broadcast plan
    assign_split_threshold: int = 1_000_000  # doc count above which the
                                  # cluster-assignment canonical pick
                                  # splits singletons (map-only emit)
                                  # from dup-cluster members (bucketed
                                  # shuffle of ~n_dup rows only); below
                                  # it one full-corpus shuffle is cheaper
                                  # than the split's extra task waves
                                  # (A/B at 500k/32: 1.1-1.5 s vs 1.6 s)
    cc_small_graph_threshold: int = 200_000  # edge count below which the
                                  # duplicate graph is solved driver-side
                                  # (vectorized union-find); above it the
                                  # distributed star rounds run
    cand_key_chunks: int = 0      # LSH candidate generation passes: the band/
                                  # anchor key space is split into this many
                                  # disjoint chunks (key % chunks), each pass
                                  # emitting + shuffling + verifying ONE chunk,
                                  # so in-flight exchange volume is bounded at
                                  # emission/chunks no matter the corpus size.
                                  # 0 = auto: ceil(estimated emission bytes /
                                  # cand_emit_budget).  A key's whole segment
                                  # lives in exactly one chunk, so the pair
                                  # multiset is identical to a single pass
                                  # (test_cand_key_chunks_identical).
    cand_emit_budget: int = 8 << 30  # auto-chunking target: max bytes of slim
                                  # candidate-key rows in one exchange.  At 20M
                                  # docs the single-pass emission (~27 GB) plus
                                  # Ray's sort-shuffle copy overflowed a 76 GiB
                                  # store into a disk-full spill; 8 GiB/pass
                                  # keeps candidates spill-free at any scale

    # --- execution -------------------------------------------------------
    seed: int = 42
    batch_size: int = 512         # docs per fingerprint batch (content is wide)
    pin_corpus: bool | None = None  # materialize the repartitioned raw corpus
                                  # once (content enters the object store a
                                  # single time); False re-executes the
                                  # source read per consumer — the choice
                                  # when the corpus exceeds object-store
                                  # capacity (100 TB case: always False).
                                  # None (default) = auto: pin only when the
                                  # estimated corpus size fits within
                                  # pin_corpus_fraction of object-store capacity
    pin_corpus_fraction: float = 0.3  # object-store fraction the pinned corpus
                                  # may occupy before auto-pin turns itself off
    target_blocks: int | None = None  # block count for the main dataset chain;
                                      # default 2x available CPUs.  Hundreds of
                                      # tiny blocks make every sort-shuffle a
                                      # scheduling storm (measured 5.6s -> 0.85s
                                      # for the exact-dedup groupby at 50k rows)
    fused_fingerprint: bool | None = None  # ONE read->normalize->fingerprint
                                  # pass over the source: signatures are
                                  # computed for ALL docs and exact-dup
                                  # losers/rejects dropped afterwards, so
                                  # raw content NEVER enters the object
                                  # store (the pin and its 2nd content
                                  # scan disappear; containment re-reads
                                  # the source for its candidate subset).
                                  # Trades dup_rate x fingerprint compute
                                  # for one full content pass + the pin
                                  # memory.  None (default) = auto: fuse
                                  # when no checkpoint_dir is in play
                                  # (per-doc signature resume needs the
                                  # winners-first plan).  False on
                                  # exact-dup-heavy corpora where
                                  # fingerprinting losers costs more
                                  # than the saved scan.
    fingerprint_mode: str = "tasks"  # "tasks" (per-process cached state) |
                                     # "actors" (dedicated pool; for heavy state)
    fingerprint_concurrency: int | tuple = 4   # actor pool size for mode="actors"
    lang_allowlist: tuple = ()    # empty = accept all (extensions.ini analogue,
                                  # reference mainwindow.cpp:74-93)

    # ---------------------------------------------------------------------
    @property
    def threshold_bits(self) -> int:
        """Slider percent -> bits-of-64, reference ``mainwindow.cpp:113``."""
        return int(round(self.simhash_bits * self.threshold_pct / 100.0))

    @property
    def threshold_frac(self) -> float:
        """Slider percent -> SSIM-style fraction, reference ``mainwindow.cpp:112``."""
        return self.threshold_pct / 100.0

    @property
    def signature_config_hash(self) -> str:
        """Hash of the fields that determine signatures (not match thresholds).

        Mirrors the reference's cache ``version`` table (``db.cpp:46-47``):
        thresholds are match-time-only parameters (``mainwindow.cpp:110-121``),
        so signature checkpoints keyed by this hash survive threshold changes.
        """
        sig_fields = {
            "shingle_k": self.shingle_k,
            "tokenizer": self.tokenizer,
            "num_perms": self.num_perms,
            "minhash_scheme": self.minhash_scheme,
            "head_tail_window": self.head_tail_window,
            "min_shingles": self.min_shingles,
            "anchor_k": self.anchor_k,
            "seed": self.seed,
        }
        return hashlib.sha256(
            json.dumps(sig_fields, sort_keys=True).encode()
        ).hexdigest()[:16]

    def to_dict(self) -> dict:
        return asdict(self)

    def __post_init__(self):
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"bands ({self.bands}) * rows_per_band ({self.rows_per_band}) "
                f"must equal num_perms ({self.num_perms})"
            )
        if self.mode not in ("simhash", "jaccard"):
            raise ValueError(f"unknown mode {self.mode!r}")
        if self.minhash_scheme == "oph" and \
                (self.num_perms & (self.num_perms - 1)) != 0:
            raise ValueError(
                "minhash_scheme='oph' needs power-of-two num_perms "
                f"(got {self.num_perms})")
        if self.tokenizer not in ("bytes", "regex"):
            raise ValueError(f"unknown tokenizer {self.tokenizer!r}")
        if self.hot_group_strategy not in ("ring", "salt"):
            raise ValueError(
                f"unknown hot_group_strategy {self.hot_group_strategy!r}")
        if self.slot_subbands < 1 or 64 % self.slot_subbands != 0:
            raise ValueError(
                f"slot_subbands must divide 64 (got {self.slot_subbands})")
        if self.cand_key_chunks <= 0 and self.cand_emit_budget <= 0:
            raise ValueError(
                "cand_emit_budget must be > 0 when cand_key_chunks is "
                f"auto (got {self.cand_emit_budget})")


DEFAULT_CONFIG = PipelineConfig()

"""Deterministic synthetic corpus generator with planted duplicate classes.

Milestone M0 (SURVEY.md §7.1).  Produces the primary input table of
``BASELINE.json::input_hint`` — ``(repo, path, commit, lang, content)`` —
plus a hidden ``truth`` table ``(doc_id, class, group_id)`` that the pipeline
never reads; golden clusters are known by construction (FIXTURES.md §2).

Duplicate classes and the reference semantics they exercise:

- ``exact``      byte-identical content            (exact dedup, sha256)
- ``whitespace`` re-indent / CRLF / trailing space (canonicalization)
- ``comment``    comment lines added/removed       (near-dup, high Jaccard)
- ``rename``     consistent identifier renames     (borderline near-dup)
- ``truncated``  head or tail ~30% removed         (CutEnds slots + containment)
- ``embedded``   doc pasted inside a larger doc    (substring pass)
- ``lowinfo``    near-empty files in bulk          (low-content guard)
- ``hotband``    shared boilerplate header         (LSH hot-band skew)
- ``unique``     unrelated filler                  (negatives)

Everything is a pure function of (n_docs, seed): no wall-clock, no RNG state
leakage, no external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .functions.text import doc_id_for

_LANG_EXT = {
    "py": ".py", "c": ".c", "cpp": ".cpp", "js": ".js",
    "java": ".java", "go": ".go", "rust": ".rs", "markdown": ".md",
}
_LANGS = list(_LANG_EXT)

# class proportions (fractions of n_docs used as *variant* rows; each variant
# row consumes one slot). group sizes are 2-4 (base + 1..3 variants).
_CLASS_FRACTIONS = [
    ("exact", 0.08), ("whitespace", 0.06), ("comment", 0.08),
    ("rename", 0.06), ("truncated", 0.06), ("embedded", 0.05),
    ("lowinfo", 0.04), ("hotband", 0.05),
]


def _make_vocab(rng: np.random.RandomState, size: int = 4000) -> list:
    syll = ["ba", "ko", "ri", "ta", "mu", "zen", "qua", "lor", "fi", "dex",
            "par", "net", "sum", "val", "idx", "buf", "ptr", "cnt", "tmp",
            "arg", "res", "out", "src", "dst", "len", "pos", "key", "map"]
    vocab = []
    seen = set()
    while len(vocab) < size:
        n = rng.randint(2, 4)
        w = "".join(syll[rng.randint(0, len(syll))] for _ in range(n))
        if rng.randint(0, 4) == 0:
            w += str(rng.randint(0, 100))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


_TEMPLATES = [
    "def {0}({1}, {2}):",
    "    {0} = {1}.{2}({3})",
    "    if {0} > {1}:",
    "        return {0} + {1}",
    "    for {0} in {1}:",
    "        {0}.append({1}[{2}])",
    "{0} = {1}({2}, {3})",
    "class {0}:",
    "    {0}.{1} = {2}",
    "while {0} < {1}: {2} += {3}",
    "    {0} = [{1} for {2} in {3}]",
    "return {0}({1}) - {2}",
    "{0} += {1} * {2}",
    "assert {0} == {1}, {2}",
    "    with {0}({1}) as {2}:",
    "import {0}",
    "from {0} import {1}",
]


class _Gen:
    def __init__(self, seed: int):
        self.rng = np.random.RandomState(seed)
        self.vocab = _make_vocab(self.rng)
        # pre-generated pool of code-ish lines; docs sample from it
        self.line_pool = [self._make_line() for _ in range(20_000)]

    def _make_line(self) -> str:
        t = _TEMPLATES[self.rng.randint(0, len(_TEMPLATES))]
        nslots = t.count("{")
        words = [self.vocab[self.rng.randint(0, len(self.vocab))]
                 for _ in range(max(nslots, 1))]
        return t.format(*words)

    def base_doc(self, min_lines=20, max_lines=160) -> list:
        n = self.rng.randint(min_lines, max_lines + 1)
        idx = self.rng.randint(0, len(self.line_pool), size=n)
        return [self.line_pool[i] for i in idx]

    # ---- variant constructors (operate on line lists) -------------------
    def v_exact(self, lines):
        return list(lines)

    def v_whitespace(self, lines):
        out = []
        for ln in lines:
            if self.rng.randint(0, 2):
                ln = "  " + ln            # re-indent
            if self.rng.randint(0, 3) == 0:
                ln = ln + "   "           # trailing spaces
            ln = ln.replace("    ", "\t") if self.rng.randint(0, 2) else ln
            out.append(ln)
        return out

    def v_comment(self, lines):
        # light touch: ~1 comment per 40 lines, so shingle damage stays small
        # and Jaccard lands above the 0.89 default threshold ("should match",
        # FIXTURES.md §2)
        out = []
        for ln in lines:
            out.append(ln)
            if self.rng.randint(0, 40) == 0:
                out.append("# " + self._make_line())
        if len(out) > 2 and self.rng.randint(0, 4) == 0:
            out.insert(0, "# " + self._make_line())
        return out

    def v_rename(self, lines):
        # 0.5–3% of distinct tokens: each rename kills up to k=7 shingles, so
        # this straddles the match threshold ("borderline", FIXTURES.md §2)
        text = "\n".join(lines)
        toks = sorted(set(w for w in text.replace("\t", " ").split()
                          if w.isidentifier()))
        if not toks:
            return list(lines)
        n_ren = max(1, int(len(toks) * (0.005 + 0.025 * self.rng.rand())))
        chosen = [toks[i] for i in
                  self.rng.choice(len(toks), size=min(n_ren, len(toks)),
                                  replace=False)]
        mapping = {w: self.vocab[self.rng.randint(0, len(self.vocab))]
                   for w in chosen}
        out_lines = []
        for ln in lines:
            parts = ln.split(" ")
            out_lines.append(" ".join(mapping.get(p, p) for p in parts))
        return out_lines

    def v_truncated(self, lines):
        cut = max(1, int(len(lines) * (0.2 + 0.2 * self.rng.rand())))
        if self.rng.randint(0, 2):
            return lines[cut:]            # head removed
        return lines[:-cut]               # tail removed

    def v_embedded(self, lines):
        before = self.base_doc(10, 60)
        after = self.base_doc(10, 60)
        return before + list(lines) + after

    def commit_for(self, repo, path):
        return hashlib.sha1(f"{repo}|{path}|commit".encode()).hexdigest()


def generate_corpus(n_docs: int, seed: int = 42,
                    hotband_group: int | None = None,
                    id_offset: int = 0) -> tuple:
    """Return ``(corpus: pa.Table, truth: pa.Table)``.

    ``hotband_group`` overrides the size of the shared-header class (for the
    skew smoke test, SURVEY.md §5.5); default scales with n_docs.
    ``id_offset`` shifts the per-doc file index used in paths so CHUNKED
    generations (write_corpus_chunked) get disjoint identity namespaces —
    identical (repo, path) draws across chunks would otherwise collide
    into duplicate doc_ids.
    """
    g = _Gen(seed)
    rng = g.rng

    rows = []          # (repo, path, commit, lang, content, cls, group_id)
    group_id = [0]

    def next_gid():
        group_id[0] += 1
        return group_id[0]

    def ident(i, lang):
        repo = f"org{int(rng.zipf(1.6)) % 40}/repo{rng.randint(0, 200)}"
        path = (f"src/mod{rng.randint(0, 50)}/"
                f"file{i + id_offset}{_LANG_EXT[lang]}")
        return repo, path, g.commit_for(repo, path)

    def add(i, lines, lang, cls, gid, joiner="\n"):
        repo, path, commit = ident(i, lang)
        rows.append((repo, path, commit, lang, joiner.join(lines), cls, gid))

    budget = n_docs
    i = 0

    # --- planted duplicate groups ---------------------------------------
    variant_fns = {
        "exact": g.v_exact, "whitespace": g.v_whitespace,
        "comment": g.v_comment, "rename": g.v_rename,
        "truncated": g.v_truncated, "embedded": g.v_embedded,
    }
    for cls, frac in _CLASS_FRACTIONS:
        n_cls = int(n_docs * frac)
        if cls == "lowinfo":
            gid = -1
            lows = ["", "x = 1", "# TODO", "pass", "x = 1\nx = 1"]
            for _ in range(n_cls):
                if budget <= 0:
                    break
                content = lows[rng.randint(0, len(lows))]
                lang = _LANGS[rng.randint(0, len(_LANGS))]
                add(i, [content], lang, "lowinfo", -1)
                i += 1
                budget -= 1
            continue
        if cls == "hotband":
            size = hotband_group if hotband_group is not None else n_cls
            header = ["# " + "=" * 40,
                      "# Licensed under the Floop Public License v2",
                      "# you may not use this file except in compliance",
                      "# with the License; obtain a copy at floop dot org",
                      "# distributed on an AS IS basis without warranties",
                      "# " + "=" * 40] + g.base_doc(8, 12)
            for _ in range(min(size, budget)):
                lang = _LANGS[rng.randint(0, len(_LANGS))]
                body = g.base_doc(20, 80)
                add(i, header + body, lang, "hotband", -1)
                i += 1
                budget -= 1
            continue
        # grouped variant classes
        produced = 0
        while produced < n_cls and budget > 0:
            gid = next_gid()
            lang = _LANGS[rng.randint(0, len(_LANGS))]
            base = g.base_doc()
            add(i, base, lang, cls, gid)
            i += 1
            budget -= 1
            produced += 1
            n_var = rng.randint(1, 4)
            for _ in range(n_var):
                if produced >= n_cls or budget <= 0:
                    break
                var = variant_fns[cls](base)
                joiner = "\r\n" if (cls == "whitespace"
                                    and rng.randint(0, 2)) else "\n"
                add(i, var, lang, cls, gid, joiner)
                i += 1
                budget -= 1
                produced += 1

    # --- unique filler ---------------------------------------------------
    while budget > 0:
        lang = _LANGS[rng.randint(0, len(_LANGS))]
        add(i, g.base_doc(), lang, "unique", -1)
        i += 1
        budget -= 1

    repo, path, commit, lang, content, cls, gid = zip(*rows)
    doc_ids = [doc_id_for(r, p, c) for r, p, c in zip(repo, path, commit)]
    corpus = pa.table({
        "repo": pa.array(repo, pa.string()),
        "path": pa.array(path, pa.string()),
        "commit": pa.array(commit, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "content": pa.array(content, pa.string()),
    })
    truth = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "class": pa.array(cls, pa.string()),
        "group_id": pa.array(gid, pa.int64()),
    })
    return corpus, truth


def write_corpus(out_dir: str, n_docs: int, seed: int = 42,
                 shards: int = 8, **kw) -> str:
    """Write corpus + truth parquet under ``out_dir`` (sharded corpus so Ray
    gets read parallelism); returns the corpus directory path."""
    import os
    import pyarrow.parquet as pq
    corpus, truth = generate_corpus(n_docs, seed=seed, **kw)
    cdir = os.path.join(out_dir, "corpus")
    os.makedirs(cdir, exist_ok=True)
    n = corpus.num_rows
    per = max(1, (n + shards - 1) // shards)
    for s in range(0, n, per):
        pq.write_table(corpus.slice(s, per),
                       os.path.join(cdir, f"part-{s // per:05d}.parquet"))
    pq.write_table(truth, os.path.join(out_dir, "truth.parquet"))
    return cdir


def _write_chunk(out_dir: str, k: int, n_docs: int, seed: int,
                 shards: int) -> None:
    """One chunk of a chunked generation (runs in its own subprocess):
    chunk-distinct seed, disjoint id namespace, group ids offset into a
    chunk-private band so truth tables concatenate cleanly."""
    import os
    import pyarrow.parquet as pq
    corpus, truth = generate_corpus(n_docs, seed=seed + 7919 * k,
                                    id_offset=k * n_docs)
    gid = truth.column("group_id").to_numpy(zero_copy_only=False).copy()
    gid[gid > 0] += np.int64(k) * np.int64(10 ** 12)
    truth = truth.set_column(truth.schema.get_field_index("group_id"),
                             "group_id", pa.array(gid, pa.int64()))
    cdir = os.path.join(out_dir, "corpus")
    os.makedirs(cdir, exist_ok=True)
    n = corpus.num_rows
    per = max(1, (n + shards - 1) // shards)
    for s in range(0, n, per):
        pq.write_table(corpus.slice(s, per),
                       os.path.join(cdir, f"part-c{k:03d}-{s // per:05d}"
                                          f".parquet"))
    pq.write_table(truth, os.path.join(out_dir, f"truth-c{k:03d}.parquet"))


def write_corpus_chunked(out_dir: str, n_docs: int, seed: int = 42,
                         chunk_docs: int = 2_000_000,
                         shards_per_chunk: int = 8,
                         max_procs: int = 5) -> str:
    """Chunked, multi-process corpus generation for stress scales.

    A single-process ``write_corpus`` builds the whole table in one heap
    (~5 GB per million docs) — a 20M-doc generation OOM-killed a 125 GiB
    box.  Here each ~``chunk_docs`` chunk generates in its own SUBPROCESS
    (bounded heap, memory returned on exit) with a chunk-distinct seed
    and a disjoint identity namespace (``id_offset``), ``max_procs``
    chunks in flight — duplicate groups live within chunks, the
    sharded-ingest shape of a real corpus.  Deterministic for a given
    (n_docs, seed, chunk_docs).
    """
    import concurrent.futures as cf
    import os
    import subprocess
    import sys
    n_chunks = -(-n_docs // chunk_docs)
    sizes = [min(chunk_docs, n_docs - k * chunk_docs)
             for k in range(n_chunks)]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _run(k):
        subprocess.run([sys.executable, "-c", (
            "import sys; sys.path.insert(0, %r); "
            "from vidupe_ray.corpus import _write_chunk; "
            "_write_chunk(%r, %d, %d, %d, %d)"
            % (repo_root, out_dir, k, sizes[k], seed, shards_per_chunk)
        )], check=True)
        return k

    os.makedirs(out_dir, exist_ok=True)
    with cf.ThreadPoolExecutor(max_workers=max_procs) as ex:
        for k in ex.map(_run, range(n_chunks)):
            pass
    return os.path.join(out_dir, "corpus")

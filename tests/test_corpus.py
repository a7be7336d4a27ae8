"""Corpus generator tests (FIXTURES.md §2): determinism, classes, schema."""

import numpy as np

from vidupe_ray.corpus import generate_corpus
from vidupe_ray.functions.text import canonicalize


def test_deterministic():
    c1, t1 = generate_corpus(300, seed=42)
    c2, t2 = generate_corpus(300, seed=42)
    assert c1.equals(c2) and t1.equals(t2)
    c3, _ = generate_corpus(300, seed=7)
    assert not c1.equals(c3)


def test_schema_and_counts():
    corpus, truth = generate_corpus(400, seed=42)
    assert corpus.column_names == ["repo", "path", "commit", "lang", "content"]
    assert truth.column_names == ["doc_id", "class", "group_id"]
    assert corpus.num_rows == 400 == truth.num_rows
    classes = set(truth["class"].to_pylist())
    assert {"exact", "whitespace", "comment", "rename", "truncated",
            "embedded", "lowinfo", "hotband", "unique"} <= classes
    # doc ids unique
    ids = truth["doc_id"].to_pylist()
    assert len(set(ids)) == len(ids)


def test_exact_class_is_byte_identical():
    corpus, truth = generate_corpus(400, seed=42)
    content = corpus["content"].to_pylist()
    cls = truth["class"].to_pylist()
    gid = truth["group_id"].to_pylist()
    groups = {}
    for i, (c, g) in enumerate(zip(cls, gid)):
        if c == "exact":
            groups.setdefault(g, []).append(content[i])
    assert groups
    for g, docs in groups.items():
        assert len(set(docs)) == 1 or len(docs) == 1


def test_whitespace_class_canonicalizes_identically():
    corpus, truth = generate_corpus(400, seed=42)
    content = corpus["content"].to_pylist()
    cls = truth["class"].to_pylist()
    gid = truth["group_id"].to_pylist()
    groups = {}
    for i, (c, g) in enumerate(zip(cls, gid)):
        if c == "whitespace":
            groups.setdefault(g, []).append(content[i])
    multi = [d for d in groups.values() if len(d) > 1]
    assert multi
    for docs in multi:
        assert len({canonicalize(d) for d in docs}) == 1


def test_embedded_class_is_substring():
    corpus, truth = generate_corpus(600, seed=42)
    content = corpus["content"].to_pylist()
    cls = truth["class"].to_pylist()
    gid = truth["group_id"].to_pylist()
    groups = {}
    for i, (c, g) in enumerate(zip(cls, gid)):
        if c == "embedded":
            groups.setdefault(g, []).append(content[i])
    multi = [d for d in groups.values() if len(d) > 1]
    assert multi
    for docs in multi:
        docs = sorted(docs, key=len)
        base = canonicalize(docs[0])
        for other in docs[1:]:
            assert base in canonicalize(other)


def test_hotband_override():
    corpus, truth = generate_corpus(500, seed=42, hotband_group=100)
    cls = np.array(truth["class"].to_pylist())
    assert (cls == "hotband").sum() == 100


def test_corpus_sanity_report(ray_session):
    """SURVEY §2.3 F4 (geometry-sanity analogue): null identity, null
    content and duplicate doc_id are counted, not silently absorbed."""
    import pyarrow as pa
    import ray.data as rd
    from vidupe_ray.sources.corpus_source import corpus_sanity
    rows = {
        "repo": ["r", "r", None, "r", "r"],
        "path": ["a.py", "b.py", "c.py", "d.py", "d.py"],   # d twice
        "commit": ["c" * 40] * 5,
        "lang": ["py"] * 5,
        "content": ["x = 1", None, "y = 2", "z = 3", "z = 3"],
    }
    t = pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
    rep = corpus_sanity(rd.from_arrow(t))
    assert rep["n_rows"] == 5
    assert rep["n_bad_identity"] == 1       # the None repo
    assert rep["n_null_content"] == 1
    assert rep["n_dup_doc_id"] == 2         # both copies of (r, d.py, c)

    clean = pa.table({
        "repo": pa.array(["r"] * 3), "path": pa.array(["a", "b", "c"]),
        "commit": pa.array(["c" * 40] * 3), "lang": pa.array(["py"] * 3),
        "content": pa.array(["1", "2", "3"])})
    rep2 = corpus_sanity(rd.from_arrow(clean))
    assert rep2 == {"n_rows": 3, "n_bad_identity": 0,
                    "n_null_content": 0, "n_dup_doc_id": 0}

"""Text canonicalization and tokenization.

The analogue of the reference's metadata/normalization maps:

- ``canonicalize``  ≈ rotation normalize (``video.cpp:104-114``): a
  deterministic canonical form applied once, before fingerprinting, so that
  presentation-only variants (CRLF vs LF, re-indent, trailing whitespace)
  become byte-identical — like Vidupe normalizing frame orientation before
  hashing.
- ``tokenize``      ≈ the frame sampling prelude to ``computePhash``
  (``video.cpp:197-228``): the unit stream that shingles are drawn from.

Both are pure functions of the row; they run inside ``map_batches`` tasks.
"""

from __future__ import annotations

import hashlib
import re

# One compiled pattern per process (reference: static Prefs shared across
# Video tasks, video.cpp:4-11).
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
_WS_RUN_RE = re.compile(r"[ \t\f\v]+")
# collapse pattern that SKIPS single plain spaces (the overwhelmingly
# common case — replacing every single space with itself wastes the
# whole pass): only 2+ runs or any tab/FF/VT need rewriting
_WS_MULTI_RE = re.compile(r"[ \t\f\v]{2,}|[\t\f\v]")


def canonicalize(text: str) -> str:
    """Deterministic canonical form of source text.

    - normalize line endings to LF
    - collapse every horizontal-whitespace run to a single space
    - strip leading/trailing whitespace per line
    - drop trailing blank lines

    Whitespace-only variants (re-indent, CRLF<->LF, trailing spaces) map to
    the same canonical string, so the exact-dedup stage catches them with a
    plain hash — the cheap path the reference never had (SURVEY.md §2.8).

    One whole-document collapse pass (single plain spaces skipped — see
    ``_WS_MULTI_RE``) + C-level ``str.strip`` per line.  The spec is
    ASCII-whitespace only (strip spaces, not unicode whitespace — mirrors
    the byte-level implementation in functions/bytetext.py; unicode
    spaces are content, not presentation).
    """
    if not text:
        return ""
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    text = _WS_MULTI_RE.sub(" ", text)
    lines = [ln.strip(" ") for ln in text.split("\n")]
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


def tokenize(canonical_text: str) -> list:
    """Word tokens (``\\w+``) of an already-canonicalized text."""
    return _TOKEN_RE.findall(canonical_text)


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def doc_id_for(repo: str, path: str, commit: str) -> int:
    """Stable 63-bit id from the identity key (repo, path, commit).

    Identity analogue of ``Video::filename`` (``video.h``/``video.cpp:7``);
    63-bit so it round-trips as int64 through Arrow/pandas/DuckDB.
    """
    h = hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode()).digest()
    return int.from_bytes(h[:8], "little") & 0x7FFF_FFFF_FFFF_FFFF

"""Deterministic text-format fixtures derived from the documents table.

The reference's TSV/CoNLL inputs (AIDA files, `dataset.py:18-138`) don't
exist in this sandbox, so the scan operators are exercised on fixtures
derived deterministically from the driver's parquet `documents` table —
same content at every run, no randomness, regenerated only if absent.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def _docs(sf_dir: str, limit: int = 200):
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"])
    rows = sorted(zip(*[tbl[c].to_pylist() for c in ["doc_id", "lang", "text"]]))[:limit]
    return rows


def tsv_fixture(sf_dir: str) -> str:
    """S5 fixture: headerless TSV (doc_id, lang, text_head) — positional."""
    out = f"/tmp/blink_fixtures/{os.path.basename(sf_dir.rstrip('/'))}_docs.tsv"
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            for doc_id, lang, text in _docs(sf_dir):
                head = (text or "").replace("\t", " ").replace("\n", " ")[:60]
                f.write(f"{doc_id}\t{lang}\t{head}\n")
        os.replace(tmp, out)
    return out


def _clean_head(text: str, start: int = 0, width: int = 60) -> str:
    return (text or "").replace("\t", " ").replace("\n", " ")[start : start + width]


def docblock_fixture(sf_dir: str) -> str:
    """S7 fixture: wiki-extractor-style ``<doc id=..>`` blocks, two content
    paragraphs per doc, derived deterministically from `documents`."""
    out = f"/tmp/blink_fixtures/{os.path.basename(sf_dir.rstrip('/'))}_docs.blocks"
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            for doc_id, _, text in _docs(sf_dir):
                f.write(f'<doc id="{doc_id}" url="local://{doc_id}">\n')
                f.write(_clean_head(text, 0) + "\n")
                f.write(_clean_head(text, 60) + "\n")
                f.write("</doc>\n")
        os.replace(tmp, out)
    return out


def jsonl_fixture(sf_dir: str) -> str:
    """S3 fixture: one JSON object per line (doc_id, lang, n_chars),
    derived deterministically from `documents`."""
    import json

    out = f"/tmp/blink_fixtures/{os.path.basename(sf_dir.rstrip('/'))}_docs.jsonl"
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]
        )
        rows = sorted(zip(*[tbl[c].to_pylist() for c in ["doc_id", "lang", "n_chars"]]))
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            for doc_id, lang, n_chars in rows:
                f.write(json.dumps({"doc_id": doc_id, "lang": lang, "n_chars": n_chars}) + "\n")
        os.replace(tmp, out)
    return out


def sqlite_fixture(sf_dir: str) -> str:
    """S11 fixture: a SQLite db with a ``mapping(doc_id, lang, n_chars)``
    table derived from `documents` — the wiki→wikidata mapping analog
    (`generate_wiki2wikidata_mappings.py:35-56`). Deterministic, so the
    DuckDB oracle can recompute the same rows from the documents view."""
    import sqlite3

    out = f"/tmp/blink_fixtures/{os.path.basename(sf_dir.rstrip('/'))}_mapping.db"
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]
        )
        rows = sorted(zip(*[tbl[c].to_pylist() for c in ["doc_id", "lang", "n_chars"]]))
        tmp = out + ".tmp"
        con = sqlite3.connect(tmp)
        con.execute("CREATE TABLE mapping (doc_id INTEGER, lang TEXT, n_chars INTEGER)")
        con.executemany("INSERT INTO mapping VALUES (?, ?, ?)", rows)
        con.commit()
        con.close()
        os.replace(tmp, out)
    return out


def conll_fixture(sf_dir: str) -> str:
    """S6 fixture: CoNLL-ish token stream. Every doc starts with
    ``-DOCSTART- (<doc_id>)``; every 7th token opens a B mention, the next
    token continues it with I — deterministic in the text alone."""
    out = f"/tmp/blink_fixtures/{os.path.basename(sf_dir.rstrip('/'))}_docs.conll"
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            for doc_id, _, text in _docs(sf_dir, limit=50):
                f.write(f"-DOCSTART- ({doc_id})\n")
                toks = (text or "").split()[:40]
                for i, tok in enumerate(toks):
                    tag = "B" if i % 7 == 0 else ("I" if i % 7 == 1 else "O")
                    f.write(f"{tok}\t{tag}\n")
                f.write("\n")
        os.replace(tmp, out)
    return out

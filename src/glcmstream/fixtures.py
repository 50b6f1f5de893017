"""Deterministic `pages` fixture generator (FIXTURES.md §1).

pages(url string, warc_ts timestamp, html binary, text string, lang string)
— exactly the input_hint shape of BASELINE.json:15. Seeded numpy, no
wall-clock, no network. html is the deterministic wrapper whose inverse is
kernel.extract_text, so the byte-identity invariant holds by construction
and tests prove the extractor.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pandas as pd

from . import kernel

BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)
TLDS = ("com", "org", "net", "de", "jp")
LANGS = ("en", "de", "fr", "es", "jp")
LANG_P = (0.55, 0.15, 0.10, 0.10, 0.10)

# tiny per-lang marker vocab so lang-id heuristics have signal
_LANG_MARKERS = {
    "en": ["the", "and", "of", "with", "page"],
    "de": ["der", "und", "nicht", "eine", "seite"],
    "fr": ["le", "et", "les", "une", "avec"],
    "es": ["el", "que", "los", "una", "con"],
    "jp": ["no", "wa", "desu", "kara", "made"],
}


def _vocab(rng: np.random.Generator, size: int = 5000) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 10, size=size)
    return np.array(["".join(rng.choice(letters, k)) for k in lens])


def gen_pages(n_docs: int, seed: int = 42, hot_host_frac: float = 0.0,
              recrawl_frac: float = 0.10, min_tokens: int = 20,
              max_tokens: int = 400) -> pd.DataFrame:
    """Generate the pages table as a pandas DataFrame (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    n_hosts = max(16, n_docs // 50)
    vocab = _vocab(rng)

    # Zipf(a=1.3) host ids, capped to the host universe
    host_idx = rng.zipf(1.3, size=n_docs) % n_hosts
    if hot_host_frac > 0:
        hot = rng.random(n_docs) < hot_host_frac
        host_idx = np.where(hot, 0, host_idx)
    tld = [TLDS[i % len(TLDS)] for i in host_idx]
    lang = rng.choice(LANGS, size=n_docs, p=LANG_P)

    # event time: base + idx*2s + jitter; 10% pushed 1-30 min late
    offset_us = (np.arange(n_docs) * 2_000_000
                 + rng.integers(0, 1_000_000, n_docs))
    late = rng.random(n_docs) < 0.10
    offset_us = np.where(
        late, offset_us - rng.integers(60, 1800, n_docs) * 1_000_000,
        offset_us)
    ts = pd.Timestamp(BASE_TS).tz_localize(None) + pd.to_timedelta(
        offset_us, unit="us")

    rows = []
    for k in range(n_docs):
        ntok = int(rng.integers(min_tokens, max_tokens))
        toks = list(rng.choice(vocab, ntok))
        markers = _LANG_MARKERS[lang[k]]
        for m in range(max(2, ntok // 10)):
            toks[int(rng.integers(0, ntok))] = markers[m % len(markers)]
        text = " ".join(toks)
        url = (f"https://host{host_idx[k]:04d}.example.{tld[k]}"
               f"/doc/{k:07d}")
        rows.append((url, ts[k], kernel.make_html(f"doc {k}", text),
                     text, lang[k]))

    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    # ~recrawl_frac of urls re-crawled later with identical text
    n_re = int(n_docs * recrawl_frac)
    if n_re:
        pick = rng.choice(n_docs, size=n_re, replace=False)
        re_rows = df.iloc[pick].copy()
        re_rows["warc_ts"] = re_rows["warc_ts"] + pd.to_timedelta(
            rng.integers(300, 3600, n_re), unit="s")
        df = pd.concat([df, re_rows], ignore_index=True)
    return df


def gen_embeddings(n_background: int, n_planted: int = 0, dim: int = 64,
                   seed: int = 999) -> tuple[pd.DataFrame, list]:
    """Deterministic unit-norm embedding fixture (vectorized — usable at
    10x+ driver-table scale for the lsh_geometry scaling legs): random
    background vectors plus n_planted near-duplicate pairs at cosine
    ~0.98 (w = v + 0.15*noise). Returns (DataFrame[vec_id, embedding],
    planted id pairs); ids are 0..n-1 with planted pairs at the tail."""
    rng = np.random.default_rng(seed)
    bg = rng.standard_normal((n_background, dim))
    v = rng.standard_normal((n_planted, dim))
    w = v + 0.15 * rng.standard_normal((n_planted, dim))
    pairs = np.empty((2 * n_planted, dim))
    pairs[0::2] = v
    pairs[1::2] = w
    M = np.concatenate([bg, pairs]) if n_planted else bg
    M = (M / np.linalg.norm(M, axis=1, keepdims=True)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(len(M), dtype=np.int64),
                        "embedding": list(M)})
    planted = [(n_background + 2 * i, n_background + 2 * i + 1)
               for i in range(n_planted)]
    return pdf, planted


def write_embeddings_parquet(out_dir: str, n_background: int,
                             n_planted: int = 0, dim: int = 64,
                             seed: int = 999, n_files: int = 8) -> str:
    """Materialize gen_embeddings as parquet (bench fixture path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf, _ = gen_embeddings(n_background, n_planted, dim, seed)
    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema([pa.field("vec_id", pa.int64()),
                        pa.field("embedding", pa.list_(pa.float32()))])
    chunks = np.array_split(np.arange(len(pdf)), n_files)
    for i, ix in enumerate(chunks):
        tbl = pa.Table.from_pandas(pdf.iloc[ix], schema=schema,
                                   preserve_index=False)
        pq.write_table(tbl, os.path.join(out_dir,
                                         f"part-{i:04d}.parquet"))
    return out_dir


def write_pages_parquet(out_dir: str, n_docs: int, seed: int = 42,
                        n_files: int = 8, hot_host_frac: float = 0.0,
                        min_tokens: int = 20, max_tokens: int = 400,
                        row_group_rows: int | None = None,
                        arrival_order: bool = False) -> str:
    """Write pages as k parquet files in warc_ts-correlated order so
    readStream(maxFilesPerTrigger=1) replays a deterministic micro-batch
    sequence (FIXTURES.md §1 'derived stream fixture').

    arrival_order=True writes rows in CRAWL order instead (generation
    index), so the ~10% late-shifted rows genuinely arrive out of
    event-time order across micro-batch boundaries and the watermark
    actually drops some — used by the late-data streaming tests. The
    default stays event-time-sorted because the determinism/batch-parity
    gates require a stream with no watermark drops (streaming == batch
    row-for-row only holds when nothing is late beyond the watermark).

    row_group_rows bounds parquet row-group size: row groups are the
    fused-scan split granularity (fused.plan_splits), so large fixtures
    write ~256-row groups (≈10 MiB at CC page sizes) the way a production
    ingest would size them for balanced scan tasks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = gen_pages(n_docs, seed=seed, hot_host_frac=hot_host_frac,
                   min_tokens=min_tokens, max_tokens=max_tokens)
    if not arrival_order:
        df = df.sort_values("warc_ts", kind="mergesort") \
            .reset_index(drop=True)
    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ])
    chunks = np.array_split(np.arange(len(df)), n_files)
    base_mtime = float(int(__import__("time").time()))
    for i, ix in enumerate(chunks):
        tbl = pa.Table.from_pandas(df.iloc[ix], schema=schema,
                                   preserve_index=False)
        path = os.path.join(out_dir, f"part-{i:04d}.parquet")
        pq.write_table(tbl, path,
                       row_group_size=row_group_rows or len(ix) or 1)
        # Strictly-increasing whole-second mtimes pin the REPLAY ORDER:
        # Spark's file source orders new files by modification time with
        # NO tiebreak, and files written back-to-back tie at ms
        # granularity — under maxFilesPerTrigger a tie permutation that
        # replays a late file before an early one advances the watermark
        # past the early file's windows and (correctly) drops its rows
        # as late. Root cause of the round-2 test_checkpoint_resume
        # full-suite flake (resumed totals 55 rows short = exactly the
        # one file replayed last). Tests must copy with shutil.copy2 to
        # preserve these stamps. (The fused manifest path is immune:
        # manifests are consumed in path order.)
        os.utime(path, (base_mtime + i, base_mtime + i))
    return out_dir

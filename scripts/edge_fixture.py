#!/usr/bin/env python
"""Adversarial EDGE fixture: the degenerate inputs the sf fixtures never hit.

The r16 edge-fixture drive (all 414 registered queries oracle-compared on
this data) caught six real robustness defects the sf0.001/0.01/0.1 gates
could not: a short-document crash class, two ANSI division-by-zero
crashes on empty text, two oracle NULL-vs-empty divergences, and a
rank-deficiency assumption. Keep this gate in the round workflow:

    python scripts/edge_fixture.py /tmp/sf-edge
    SPARK_GRAFT_TEST_SF_DIR=/tmp/sf-edge python scripts/drive.py

Design: every table stays INSIDE the generator's value domains
(``source`` = src0..src19, ``lang`` in {en,fr,de,es,zh} — several queries
legitimately parse the trailing source integer per TESTDATA's contract);
the adversarial axis is the OPEN domain, document text: empty,
whitespace-only, every length 1..15 (sub-window lengths for byte-fold
kernels), multibyte, degenerate repetition, and exact/near duplicates
placed across the doc_id mod classes the curation/dedup splits use.
TPC-H/events/embeddings are small slices of sf0.001 so joins stay
non-degenerate while cardinalities (e.g. fewer embedding vectors than
dimensions) stress rank/count assumptions.

Third axis (EMBEDDINGS content): adversarial but storable vectors — the
all-zero vector (cosine undefined; Spark ANSI raises DIVIDE_BY_ZERO where
DuckDB's double division yields NULL), an exact duplicate INSIDE the probe
set (vec_id < N_QUERY_VECS) plus a corpus duplicate pair (top-k ties at
cosine exactly 1.0), an antipodal vector (cosine exactly -1), a subnormal
1e-30 vector (squares underflow float32 — pins that both engines promote
to double BEFORE multiplying), a 1e15 outlier, and an orthogonal one-hot.
vec_id 8 and 9 land in IVF_ADMIT_RESIDUES (8, 9 mod 10), so the zero
vector and the probe-duplicate also flow through the IVF admission
lifecycle, not just the batch scorers.
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.001"

SLICES = {
    "region": None,
    "nation": None,
    "customer": 60,
    "supplier": 40,
    "part": 60,
    "orders": 120,
    "lineitem": 300,
    "events": 200,  # + edge_events() appended below
    # 8 base vectors (< EMBEDDING_DIM — rank stress preserved) +
    # edge_embeddings() appended below (ids 8, 9, 9001..9007).
    "embeddings": 8,
}

LANGS = ["en", "fr", "de", "es", "zh"]


def edge_documents() -> list:
    rows = [(1, "")]  # empty
    for ln in range(1, 16):  # every sub-window length 1..15
        rows.append((1 + ln, "abcdefghijklmno"[:ln]))
    rows += [
        (17, "   \t  \n "),  # whitespace-only
        (18, "é日本語ü " * 3),  # multibyte
        (19, "the quick brown fox jumps over the lazy dog " * 40),
        (20, "the quick brown fox jumps over the lazy dog " * 40),  # dup
        (21, "word " * 200),  # degenerate repetition
        (22, "singleword"),
        (23, "a b"),
        (24, "the quick brown fox jumps over the lazy dog " * 40 + "tail"),
        (30, "completely different archive text about rivers and hills"),
        (33, "completely different archive text about rivers and hills"),
        (36, "another unique document with several plain words in it"),
    ]
    return sorted(rows)


def edge_events(next_id: int) -> list:
    """Adversarial but in-domain event rows: total same-timestamp ties,
    single-event users, a 1-microsecond gap beside a 28-day one (the
    case that exposed the third un-keyed staging cache AND the
    trajectory-dependent session-close label), window-boundary hits."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 15, 12, 0, 0)  # exact hour boundary
    for i, et in enumerate(
        ["view", "click", "view", "purchase", "error", "signup"]
    ):
        rows.append((next_id + i, t0, 9001, et, 1.0 + i, '{"k": %d}' % i))
    next_id += 6
    rows.append(
        (next_id, dt.datetime(2024, 1, 20), 9002, "signup", 0.03, '{"k": 0}')
    )
    next_id += 1
    rows += [
        (next_id, dt.datetime(2024, 1, 2, 3, 4, 5, 0), 9003, "view",
         5.0, '{"k": 1}'),
        (next_id + 1, dt.datetime(2024, 1, 2, 3, 4, 5, 1), 9003, "click",
         5.0, '{"k": 2}'),
        (next_id + 2, dt.datetime(2024, 1, 30, 23, 0), 9003, "purchase",
         327.53, '{"k": 99}'),
    ]
    next_id += 3
    for i in range(4):  # identical (ts, value) — pure tie-break stress
        rows.append(
            (next_id + i, dt.datetime(2024, 1, 10, 6, 30), 9004, "view",
             7.77, '{"k": 7}')
        )
    return rows


def edge_embeddings(base_tab) -> list:
    """Adversarial vector rows appended to the 8-row base slice.

    ids 8 and 9 complete the probe set (vec_id < 10) AND fall in
    IVF_ADMIT_RESIDUES, so the zero vector and the probe duplicate are
    exercised by the admission lifecycle too. Labels stay in 0..9.
    """
    dim = len(base_tab.column("embedding")[0].as_py())
    base0 = base_tab.column("embedding")[0].as_py()
    base1 = base_tab.column("embedding")[1].as_py()
    return [
        (8, [0.0] * dim, 5),  # zero vector IN the probe set
        (9, list(base0), 6),  # probe-set exact duplicate of vec 0
        (9001, list(base0), 9),  # corpus duplicate of probe 0 ...
        (9002, list(base0), 7),  # ... and its tie twin (9001 vs 9002)
        (9003, [-x for x in base1], 0),  # antipodal to probe 1
        (9004, [1e-30] * dim, 7),  # squares underflow float32
        (9005, [1e15] * dim, 3),  # magnitude outlier
        (9006, [1.0] + [0.0] * (dim - 1), 1),  # orthogonal one-hot
        # nonzero FULL vector whose 32-dim matryoshka prefix is all
        # zero — the prefix-norm gate's case (zero-norm gate passes it)
        (9007, [0.0] * (dim - 1) + [1.0], 2),
    ]


def build_edge_fixture(dst: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for t, n in SLICES.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        if n:
            tab = tab.slice(0, n)
        if t == "events":
            rows = edge_events(max(tab.column("event_id").to_pylist()) + 1)
            adv = pa.table(
                {
                    "event_id": pa.array(
                        [r[0] for r in rows], pa.int64()
                    ),
                    "ts": pa.array(
                        [r[1] for r in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array(
                        [r[2] for r in rows], pa.int64()
                    ),
                    "event_type": [r[3] for r in rows],
                    "value": pa.array(
                        [r[4] for r in rows], pa.float64()
                    ),
                    "props": [r[5] for r in rows],
                }
            )
            tab = pa.concat_tables([tab.cast(adv.schema), adv])
        if t == "embeddings":
            erows = edge_embeddings(tab)
            adv = pa.table(
                {
                    "vec_id": pa.array([r[0] for r in erows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in erows], pa.list_(pa.float32())
                    ),
                    "label": pa.array([r[2] for r in erows], pa.int32()),
                }
            )
            tab = pa.concat_tables([tab.cast(adv.schema), adv])
        pq.write_table(tab, f"{dst}/{t}.parquet")
    rows = edge_documents()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [LANGS[i % len(LANGS)] for i in range(len(rows))],
                "source": [f"src{i % 20}" for i in range(len(rows))],
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        f"{dst}/documents.parquet",
    )
    return dst


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf-edge"
    print(build_edge_fixture(out))

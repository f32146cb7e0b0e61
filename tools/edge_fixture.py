#!/usr/bin/env python3
"""Edge-case documents fixture for end-to-end oracle parity (driver-side
tooling; not part of the Spark library). Exercises the inputs where
Spark<->DuckDB hash parity historically diverges: empty text, empty tokens
from consecutive spaces, non-ASCII BMP, and supplementary-plane (emoji)
code points. Usage:

  python3 tools/edge_fixture.py /tmp/edgedata
  GRAFT_ONLY=q01_token_count,...  sbt "runMain graft.Verify /tmp/edgedata /tmp/verify_edge"
  python3 tools/compare_oracle.py /tmp/edgedata /tmp/verify_edge
"""
import sys, os
import pyarrow as pa, pyarrow.parquet as pq

DOCS = [
    (0, ""),
    (1, " "),
    (2, "a  b"),
    (3, "héllo wörld unicode tokens here today"),
    (4, "🙂 emoji doc with astral chars 🌍 ok right"),
    (5, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (6, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (7, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"),
    (8, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (9, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix words"),
    (10, "completely different content about sailing ships and ocean navigation charts"),
    (11, "is the of and a the is of and the"),
    (12, "MiXeD CaSe TeXt With  double  spaces and CAPS"),
    (13, "short"),
    (14, "twelve tokens exactly one two three four five six seven eight nine"),
    # multi-line documents (dup-line fraction; real corpora carry \n even
    # though the driver's synthetic documents do not)
    (15, "alpha beta\nalpha beta\ngamma delta\n\nalpha beta"),
    (16, "single trailing newline here\n"),
    (17, "no duplicate lines\nsecond line content\nthird line content"),
    # q55's separator word inside a multi-line doc
    (18, "left part line right part\nleft part line right part"),
]

def main(outdir):
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
        "lang": pa.array(["en"] * len(DOCS), pa.string()),
        "source": pa.array(["edge"] * len(DOCS), pa.string()),
        "n_chars": pa.array([len(d[1]) for d in DOCS], pa.int64()),
    })
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(tbl, os.path.join(outdir, "documents.parquet"))
    print(f"wrote {tbl.num_rows} docs to {outdir}/documents.parquet")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/edgedata")

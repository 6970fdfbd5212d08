"""Write plans/r13/<query>_<tag>.txt explain('formatted') snapshots.

Usage: python tools/snap_r13.py <out_dir> <tag> <query> [...]
Run from the repo root whose code should produce the plans.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    out_dir, tag = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from ffi_etl_spark.session import get_session

    spark = get_session("snap_r13")
    qs = entry_mod.queries()
    for q in sys.argv[3:]:
        df = qs[q](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{q}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

"""Storage inspector CLI — the counterpart of the reference's `convertor`
debugger binary (src/bin/convertor.rs): dump what the engine's pruning
and recovery machinery sees, as JSON.

Usage:
  sneldb-inspect <cmd> ...       (console script; python -m sneldb_spark.tools.inspector also works)
  python tools/inspector.py segments     <engine_root>
  python tools/inspector.py footer       <file.parquet>
  python tools/inspector.py column       <file-or-dir> <field>
  python tools/inspector.py wal          <engine_root>
  python tools/inspector.py schemas      <schemas.json>
  python tools/inspector.py materialized <engine_root>

The reference dumps zones / column indexes / XOR filters / enum bitmaps;
our equivalents are Parquet row groups and footer statistics (plus the
JSON sidecars: WAL, schema store, materialization manifests). Reads only
— safe to point at a live engine root.
"""

from __future__ import annotations

import json
import os
import sys

from sneldb_spark.store import inspect as ins


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv
    if len(argv) < 3:
        print(__doc__)
        return 2
    cmd = argv[1]
    try:
        if cmd == "segments":
            out = ins.segment_report(argv[2])
        elif cmd == "footer":
            out = ins.footer_report(argv[2])
        elif cmd == "column":
            if len(argv) < 4:
                print(__doc__)
                return 2
            out = ins.column_report(argv[2], argv[3])
        elif cmd == "wal":
            out = ins.wal_report(argv[2])
        elif cmd == "schemas":
            out = ins.schemas_report(argv[2])
        elif cmd == "materialized":
            out = ins.materialized_report(argv[2])
        else:
            print(__doc__)
            return 2
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(json.dumps(out, indent=2, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())

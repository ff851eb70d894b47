"""Schema-store maintenance CLI — counterpart of the reference's
`schema_store_tool` binary (reference: src/bin/schema_store_tool.rs).

Usage:
  python tools/schema_store_tool.py verify <path/to/schemas.json>
  python tools/schema_store_tool.py repair <path/to/schemas.json> <output.json>

Prints a JSON report: {version, valid_records, skipped_records, issues,
repaired_to}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sneldb_spark.errors import SchemaError
from sneldb_spark.schema.registry import diagnose_store, repair_store


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    cmd = argv[1]
    try:
        if cmd == "verify":
            report = diagnose_store(argv[2])
            report.pop("_valid", None)
            report["repaired_to"] = None
        elif cmd == "repair":
            if len(argv) != 4:
                print(__doc__, file=sys.stderr)
                return 2
            report = repair_store(argv[2], argv[3])
        else:
            print(__doc__, file=sys.stderr)
            return 2
    except SchemaError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

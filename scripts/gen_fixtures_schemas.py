#!/usr/bin/env python3
"""Regenerate the footer-truth schema appendix in FIXTURES.md.

The r12 incident: the driver regenerated the fixtures with events.ts as
TIMESTAMP(MICROS) while FIXTURES.md still documented TIMESTAMP(NANOS), and
the hardcoded ns assumption in the engine corrupted every events query.
The engine is now footer-driven (graft.Tables.TsEncoding), and this script
keeps the DOCS footer-driven too: it dumps the actual parquet logical
types of every fixture table into a clearly-marked generated block at the
end of FIXTURES.md. Run it after any fixture regeneration:

    python3 scripts/gen_fixtures_schemas.py

Driver-side tooling only (pyarrow) — not part of the Scala library.
"""
import glob
import os
import re
import sys

import pyarrow.parquet as pq

TESTDATA = "/root/testdata"
FIXTURES_MD = os.path.join(os.path.dirname(__file__), "..", "FIXTURES.md")
BEGIN = "<!-- BEGIN GENERATED: footer-truth schemas (scripts/gen_fixtures_schemas.py) -->"
END = "<!-- END GENERATED -->"


def first_parquet(path):
    """A fixture table is a single file or a directory of part files."""
    if os.path.isfile(path):
        return path
    parts = sorted(
        p for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(p).startswith(("_", "."))
    )
    if not parts:
        raise SystemExit(f"no parquet files under {path}")
    return parts[0]


def table_block(sf_dir):
    lines = []
    for tbl_path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(tbl_path).removesuffix(".parquet")
        f = pq.ParquetFile(first_parquet(tbl_path))
        phys = f.schema  # parquet-level schema: carries the logical types
        rows = f.metadata.num_rows
        cols = []
        for i in range(len(phys)):
            c = phys.column(i)
            logical = str(c.logical_type).strip() or "NONE"
            cols.append(f"`{c.name}` {c.physical_type}[{logical}]")
        lines.append(f"- **{name}** ({rows} rows/file): " + "; ".join(cols))
    return "\n".join(lines)


def main():
    sections = []
    for sf_dir in sorted(glob.glob(os.path.join(TESTDATA, "sf*"))):
        sections.append(f"### {os.path.basename(sf_dir)}\n" + table_block(sf_dir))
    body = (
        f"{BEGIN}\n\n"
        "## Appendix: footer truth (generated — do not hand-edit)\n\n"
        "Parquet physical[logical] types as actually stored, per scale\n"
        "factor. If a row here disagrees with the prose tables above, the\n"
        "FOOTER wins — and the prose needs updating.\n\n"
        + "\n\n".join(sections)
        + f"\n\n{END}\n"
    )
    with open(FIXTURES_MD, encoding="utf-8") as fh:
        doc = fh.read()
    if BEGIN in doc:
        # lambda replacement: the generated body must be inserted
        # literally, never interpreted as a regex template
        doc = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END) + r"\n?",
                     lambda _m: body, doc, flags=re.S)
    else:
        doc = doc.rstrip("\n") + "\n\n" + body
    with open(FIXTURES_MD, "w", encoding="utf-8") as fh:
        fh.write(doc)
    print(f"regenerated appendix in {os.path.normpath(FIXTURES_MD)}")


if __name__ == "__main__":
    sys.exit(main())

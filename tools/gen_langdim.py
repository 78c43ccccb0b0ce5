"""Regenerate crawlkit/langdata.py from the reference's public ISO-639
language table (/root/reference/src/languages.json — public ISO data,
not code).  Run whenever the dim needs a refresh:

    python tools/gen_langdim.py

The emitted module keeps the ARRAY ORDER of the source table because
the reference resolves ambiguous name forms by linear scan, first
match wins (src/lang.ts:3-17) — conflict resolution must use the same
order to reproduce its answers.
"""

from __future__ import annotations

import json
import pathlib

SRC = pathlib.Path("/root/reference/src/languages.json")
DST = pathlib.Path(__file__).resolve().parent.parent / "crawlkit" / "langdata.py"


def main() -> None:
    entries = json.loads(SRC.read_text())
    lines = [
        '"""ISO-639 language dimension data (generated — do not edit).',
        "",
        "Public ISO-639 data, row order preserved from the reference's",
        "table (src/languages.json) because form-conflict resolution is",
        'first-match-wins in array order (src/lang.ts:3-17)."""',
        "",
        "# (iso639_1, iso639_3, english_name, native_name)",
        "LANGUAGES: list[tuple[str, str, str, str]] = [",
    ]
    for iso1, iso3, english, native in entries:
        lines.append(f"    ({iso1!r}, {iso3!r}, {english!r}, {native!r}),")
    lines.append("]")
    lines.append("")
    DST.write_text("\n".join(lines))
    print(f"wrote {DST} with {len(entries)} languages")


if __name__ == "__main__":
    main()

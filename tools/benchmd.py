"""BENCH.md section writer: replace-in-place instead of blind append.

Round-2 ADVICE: tools/scaling.py appended a new '## Scaling: ...'
section per run, leaving five contradictory efficiency numbers in
BENCH.md with no way to tell which is authoritative.  This helper
keeps exactly ONE section per header — a re-run replaces its own
previous output.
"""

from __future__ import annotations

BENCH = "/root/repo/BENCH.md"


def replace_section(header: str, body_md: str, path: str = BENCH) -> None:
    """Replace the '## {header}' section (up to the next '## ' or EOF)
    with ``body_md``; append the section if absent.  ``body_md`` must
    include its own '## ' header line."""
    with open(path) as f:
        lines = f.readlines()
    start = next(
        (i for i, ln in enumerate(lines) if ln.rstrip("\n") == f"## {header}"),
        None,
    )
    block = body_md.strip("\n") + "\n"
    if start is None:
        text = "".join(lines).rstrip("\n") + "\n\n" + block
    else:
        end = next(
            (j for j in range(start + 1, len(lines))
             if lines[j].startswith("## ")),
            len(lines),
        )
        text = "".join(lines[:start]) + block + "\n" + "".join(lines[end:])
    with open(path, "w") as f:
        f.write(text)

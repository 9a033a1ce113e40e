"""Source fingerprints for the declared query registry (rotation freshness).

Round-11 verdict: the driver-window rotation in ``__spark_entry__`` keyed
ONLY on the round a query last passed the DuckDB oracle, so a query whose
implementation was rewritten AFTER its green row kept stale credit (r11:
q295/q299/q306/q308 plan fixes and the q55/q100/q132/q169 sp-win
migrations all shipped with pre-rewrite driver rows).  This module closes
that blind spot: each query gets a *source fingerprint* — the md5 of its
full registration chunk (the ``@_register(...)`` decorator, which carries
the DuckDB oracle SQL, through the builder function body, up to the next
registration) — computed both for the CURRENT tree and for the git
revision whose driver run produced the query's last green row.  A mismatch
means "changed since verified" and the rotation sorts the query with the
never-verified bucket.

The chunk extraction is purely textual so the same algorithm applies to
any historical revision via ``git show`` (no import of old code).  A chunk
also absorbs any module-level helpers defined between two registrations;
that over-approximates "changed" for the query immediately above a new
helper, which only costs an extra re-verification — fail-safe direction.

Known under-approximation: a chunk covers only ``queries.py`` text, so an
edit to an ``operators/`` function a builder imports does NOT flip its
fingerprint (flipping every importer would flood the 50-slot driver
window and starve the staleness drain).  Mitigation: every round closes
with the FULL builder-level parity sweep (``scripts/check_parity.py``
over all declared queries, vanilla session), which exercises operator
code through every query that uses it — an operator edit is verified the
same round it lands, just not by the driver's own window.

Usage (round start, BEFORE editing any query):
    python scripts/fprints.py          # rewrites QUERY_FPRINTS.json
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_QUERIES_REL = "league_of_legends_data_pipeline_spark/plans/queries.py"
_FPRINTS = os.path.join(_REPO, "QUERY_FPRINTS.json")
_NAME_RE = re.compile(r'"(q\d+[a-z0-9_]*)"')


def extract_chunks(text: str) -> dict[str, str]:
    """Split queries.py text into per-query registration chunks.

    A chunk runs from a line starting with ``@_register(`` to the line
    before the next such line (or EOF).  The query name is the first
    ``"qNNN_..."`` string literal inside the chunk's first lines.
    """
    lines = text.splitlines(keepends=True)
    starts = [i for i, ln in enumerate(lines) if ln.startswith("@_register(")]
    chunks: dict[str, str] = {}
    for idx, start in enumerate(starts):
        end = starts[idx + 1] if idx + 1 < len(starts) else len(lines)
        chunk = "".join(lines[start:end])
        m = _NAME_RE.search(chunk)
        if m:
            chunks[m.group(1)] = chunk
    return chunks


def fingerprint_chunks(text: str) -> dict[str, str]:
    return {
        name: hashlib.md5(chunk.encode("utf-8")).hexdigest()
        for name, chunk in extract_chunks(text).items()
    }


def current_fingerprints(repo: str = _REPO) -> dict[str, str]:
    with open(os.path.join(repo, _QUERIES_REL), encoding="utf-8") as f:
        return fingerprint_chunks(f.read())


def _correctness_files(repo: str) -> dict[int, str]:
    """round -> basename (zero-padded on disk, e.g. CORRECTNESS_r07.json)."""
    out: dict[int, str] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m:
            out[int(m.group(1))] = os.path.basename(path)
    return out


def _last_green_rounds(repo: str = _REPO) -> dict[str, int]:
    last: dict[str, int] = {}
    for rnd, base in _correctness_files(repo).items():
        path = os.path.join(repo, base)
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("rows_match") and \
                    row.get("schema_match") and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _round_commit(repo: str, rnd: int) -> str | None:
    """Commit whose tree holds the code the round-``rnd`` driver run tested.

    The driver commits ``CORRECTNESS_r{rnd}.json`` at round close in the
    same commit as (or immediately after) the tested working tree, so the
    last commit touching that file is the tested revision.
    """
    base = _correctness_files(repo).get(rnd)
    if not base:
        return None
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--", base],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout.strip()
        return out or None
    except (subprocess.CalledProcessError, OSError):
        return None


def _file_at(repo: str, commit: str) -> str | None:
    try:
        return subprocess.run(
            ["git", "show", f"{commit}:{_QUERIES_REL}"],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout
    except (subprocess.CalledProcessError, OSError):
        return None


def build_fprints(repo: str = _REPO) -> dict[str, dict]:
    """name -> {round, fprint} with fprint taken at the last-green revision."""
    last = _last_green_rounds(repo)
    historical: dict[int, dict[str, str]] = {}
    for rnd in sorted(set(last.values())):
        commit = _round_commit(repo, rnd)
        text = _file_at(repo, commit) if commit else None
        historical[rnd] = fingerprint_chunks(text) if text else {}
    out: dict[str, dict] = {}
    for name, rnd in sorted(last.items()):
        fp = historical.get(rnd, {}).get(name)
        out[name] = {"round": rnd, "fprint": fp}  # fp None => treat changed
    return out


def main() -> None:
    fprints = build_fprints()
    with open(_FPRINTS, "w") as f:
        json.dump(fprints, f, indent=1, sort_keys=True)
        f.write("\n")
    cur = current_fingerprints()
    changed = [n for n, rec in fprints.items()
               if rec["fprint"] is None or rec["fprint"] != cur.get(n)]
    print(f"wrote {_FPRINTS}: {len(fprints)} queries, "
          f"{len(changed)} changed-since-green: {changed}")


if __name__ == "__main__":
    sys.exit(main())

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

Round-13 verdict item #1 extended the fingerprint past ``queries.py``: a
chunk's hash now also folds in the source of every repo-internal function
the chunk imports (``from league_of_legends_data_pipeline_spark.operators.
text import tokens`` inside a builder body), transitively through
same-module helpers and the modules THEY import — so the r13-class
operator rewrites (q167/q173/q338 via ``text._bigram_pairs``, q186 via
``dedup.prefix_filter_pairs``, …) flip their importers' fingerprints and
front the driver's oracle window.  The closure is function-level, not
module-level, so an edit to one operator only flips the queries that
actually reach it (module-level hashing would flood the 50-slot window
with every importer of a 2000-line file).

The chunk extraction is purely textual and the dependency closure uses
``ast`` over file text, so the same algorithm applies to any historical
revision via ``git show`` (no import of old code).  A chunk also absorbs
any module-level helpers defined between two registrations; that
over-approximates "changed" for the query immediately above a new helper,
which only costs an extra re-verification — fail-safe direction.

Known under-approximations (mitigated by the FULL builder-level parity
sweep every round closes with — ``scripts/check_parity.py`` over all
declared queries exercises every operator through every query that uses
it the same round an edit lands):

- ``queries.py``'s own module header (the ``_t``/``_sorted_small``
  helpers and the ``session.load_tables`` import) is outside every chunk;
  an edit there flips no fingerprint.  Deliberate: load_tables is on
  every query's path, so folding it in would flip all ~340 queries at
  once and reduce the rotation to registry order.
- A dependency reached only through dynamic dispatch (getattr, string
  lookup) is invisible to the AST walk.  The repo's builders use direct
  ``from … import name`` imports throughout.

Usage (round start, BEFORE editing any query):
    python scripts/fprints.py          # rewrites QUERY_FPRINTS.json
"""

from __future__ import annotations

import ast
import glob
import hashlib
import json
import os
import re
import subprocess
import sys
from typing import Callable, Optional

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_QUERIES_REL = "league_of_legends_data_pipeline_spark/plans/queries.py"
_FPRINTS = os.path.join(_REPO, "QUERY_FPRINTS.json")
_NAME_RE = re.compile(r'"(q\d+[a-z0-9_]*)"')
_PKG = "league_of_legends_data_pipeline_spark"


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


# ---------------------------------------------------------------------------
# repo-internal dependency closure (r13 verdict item #1)
# ---------------------------------------------------------------------------

# module text accessor: module dotted path -> source text or None.
# Callers bind it to the working tree or to a git revision.
ModuleReader = Callable[[str], Optional[str]]


def _module_index(text: str):
    """Index a module's top-level definitions for the dependency closure.

    Returns ``(blocks, node_of, header_imports)`` where ``blocks`` maps a
    top-level name to its source segment (decorators included),
    ``node_of`` maps it to its AST node, and ``header_imports`` maps a
    local alias to ``(module, original_name)`` for repo-internal
    module-header ``from … import``s.  Returns None on a syntax error
    (callers treat the module as unreadable — fail-safe: the dependency
    hashes as ``<unreadable>`` and any readable counterpart mismatches).
    """
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return None
    lines = text.splitlines(keepends=True)
    blocks: dict[str, str] = {}
    node_of: dict[str, ast.AST] = {}
    header_imports: dict[str, tuple[str, str]] = {}
    for node in tree.body:
        if isinstance(node, ast.ImportFrom) and node.module and \
                node.module.startswith(_PKG):
            for a in node.names:
                header_imports[a.asname or a.name] = (node.module, a.name)
            continue
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            names = [node.name]
            start = min([node.lineno] + [d.lineno
                                         for d in node.decorator_list])
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            start = node.lineno
        elif isinstance(node, ast.AnnAssign) and \
                isinstance(node.target, ast.Name):
            names = [node.target.id]
            start = node.lineno
        else:
            continue
        src = "".join(lines[start - 1:node.end_lineno])
        for nm in names:
            blocks[nm] = src
            node_of[nm] = node
    return blocks, node_of, header_imports


def _block_refs(node: ast.AST) -> tuple[set[str], set[tuple[str, str]]]:
    """Names referenced inside a block + repo-internal from-imports nested
    anywhere in it (the builders import operators inside function bodies)."""
    refs: set[str] = set()
    ext: set[tuple[str, str]] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name):
            refs.add(sub.id)
        elif isinstance(sub, ast.ImportFrom) and sub.module and \
                sub.module.startswith(_PKG):
            for a in sub.names:
                ext.add((sub.module, a.name))
    return refs, ext


def chunk_imports(chunk_text: str) -> set[tuple[str, str]]:
    """Repo-internal ``(module, name)`` imports anywhere in a chunk."""
    try:
        tree = ast.parse(chunk_text)
    except SyntaxError:
        return set()
    out: set[tuple[str, str]] = set()
    for sub in ast.walk(tree):
        if isinstance(sub, ast.ImportFrom) and sub.module and \
                sub.module.startswith(_PKG):
            for a in sub.names:
                out.add((sub.module, a.name))
    return out


def _md5(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def dep_signature(start: set[tuple[str, str]],
                  read_module: ModuleReader) -> list[str]:
    """Sorted ``module:name:md5`` lines for the transitive closure of the
    given repo-internal imports.  Closure follows (a) top-level names of
    the same module referenced by a block, (b) the module's repo-internal
    header imports the block references, (c) repo-internal from-imports
    nested inside the block.  An unresolvable module or name contributes a
    sentinel line, so "cannot read" never hashes equal to "read fine"."""
    index_cache: dict[str, object] = {}

    def index(mod: str):
        if mod not in index_cache:
            text = read_module(mod)
            index_cache[mod] = None if text is None else _module_index(text)
        return index_cache[mod]

    seen: set[tuple[str, str]] = set()
    todo = sorted(start)
    parts: set[str] = set()
    while todo:
        mod, name = todo.pop()
        if (mod, name) in seen:
            continue
        seen.add((mod, name))
        idx = index(mod)
        if idx is None:
            parts.add(f"{mod}:{name}:<unreadable>")
            continue
        blocks, node_of, header = idx
        if name not in blocks:
            # ``from pkg.operators import text``-style module import:
            # hash the whole submodule (coarse, fail-safe direction)
            sub_text = read_module(f"{mod}.{name}")
            parts.add(f"{mod}:{name}:"
                      + (f"<module:{_md5(sub_text)}>" if sub_text is not None
                         else "<missing>"))
            continue
        parts.add(f"{mod}:{name}:{_md5(blocks[name])}")
        refs, ext = _block_refs(node_of[name])
        for r in refs:
            if r == name:
                continue
            if r in blocks:
                todo.append((mod, r))
            elif r in header:
                todo.append(header[r])
        todo.extend(ext)
    return sorted(parts)


def _tree_reader(repo: str) -> ModuleReader:
    def read(mod: str) -> Optional[str]:
        rel = mod.replace(".", "/")
        for cand in (rel + ".py", rel + "/__init__.py"):
            path = os.path.join(repo, cand)
            if os.path.isfile(path):
                with open(path, encoding="utf-8") as f:
                    return f.read()
        return None
    return read


def _git_reader(repo: str, commit: str) -> ModuleReader:
    cache: dict[str, Optional[str]] = {}

    def read(mod: str) -> Optional[str]:
        if mod in cache:
            return cache[mod]
        rel = mod.replace(".", "/")
        text = None
        for cand in (rel + ".py", rel + "/__init__.py"):
            try:
                r = subprocess.run(
                    ["git", "show", f"{commit}:{cand}"],
                    cwd=repo, capture_output=True, text=True, check=True,
                )
                text = r.stdout
                break
            except (subprocess.CalledProcessError, OSError):
                continue
        cache[mod] = text
        return text
    return read


def fingerprint_chunks(text: str,
                       read_module: ModuleReader | None = None
                       ) -> dict[str, str]:
    """Per-query fingerprints: md5 of the chunk text plus the dependency
    signature of its repo-internal imports.  With no ``read_module`` the
    dependency closure is skipped (chunk-text-only, the pre-r14 scheme —
    used by synthetic-text tests)."""
    out: dict[str, str] = {}
    for name, chunk in extract_chunks(text).items():
        if read_module is None:
            out[name] = _md5(chunk)
            continue
        sig = dep_signature(chunk_imports(chunk), read_module)
        out[name] = _md5(chunk + "\n#DEPS\n" + "\n".join(sig))
    return out


def current_fingerprints(repo: str = _REPO) -> dict[str, str]:
    with open(os.path.join(repo, _QUERIES_REL), encoding="utf-8") as f:
        return fingerprint_chunks(f.read(), _tree_reader(repo))


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

    The driver creates ``CORRECTNESS_r{rnd}.json`` once, at round close, in
    the same commit as (or immediately after) the tested working tree — so
    the commit that ADDED the file is the tested revision.  r12 ADVICE: the
    previous implementation took the LAST commit touching the file, which a
    later reformat/re-commit would silently move forward, recording
    post-rewrite fingerprints as "tested" (fail-open).  ``--diff-filter=A``
    pins the add; the newest add wins if the file was ever re-created.
    """
    base = _correctness_files(repo).get(rnd)
    if not base:
        return None
    try:
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--", base],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout.split()
        return out[0] if out else None
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
        historical[rnd] = (
            fingerprint_chunks(text, _git_reader(repo, commit))
            if text else {}
        )
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

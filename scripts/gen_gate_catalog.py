"""Regenerate docs/GATES.md from the registry docstrings."""
import importlib.util
import sys

sys.path.insert(0, "/root/repo")
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
qs, osql = m.queries(), m.oracle_sql()
lines = [
    "# Gate catalog — every `queries()` entry",
    "",
    "Auto-generated from the registry docstrings "
    "(scripts/gen_gate_catalog.py). One row per driver-checkable gate; "
    "all entries also carry a DuckDB `oracle_sql()` twin.",
    "",
    f"Total gates: {len(qs)} (oracles: {len(osql)}).",
    "",
    "| # | Gate | What it proves |",
    "|---|---|---|",
]
for i, (name, fn) in enumerate(qs.items(), 1):
    doc = (fn.__doc__ or "").strip().split("\n\n")[0]
    doc = " ".join(x.strip() for x in doc.split("\n"))
    if len(doc) > 220:
        doc = doc[:217] + "..."
    doc = doc.replace("|", "\\|")
    lines.append(f"| {i} | `{name}` | {doc} |")
open("/root/repo/docs/GATES.md", "w").write("\n".join(lines) + "\n")
print("wrote", len(qs), "rows")

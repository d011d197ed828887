#!/usr/bin/env python3
"""Extract (label, doc, schema, expected) golden cases from the reference's
pg_regress output (/root/reference/expected/json_schema_validate.out) into
src/test/resources/golden_cases.json for the table-driven ScalaTest spec.

This transcribes test DATA (behavioral contract), not implementation code.
"""
import json, re, sys

OUT = "/root/reference/expected/json_schema_validate.out"

def pg_unquote(s):
    return s.replace("''", "'")

def main():
    text = open(OUT).read()
    # Split into statements: each begins at start-of-line "SELECT "
    blocks = re.split(r"(?m)^(?=SELECT )", text)
    cases, skipped = [], []
    for b in blocks:
        if not b.startswith("SELECT "):
            continue
        # statement = everything up to the first line that starts the result table
        m = re.match(r"(?s)(SELECT .*?;)\s*\n(.*)", b)
        if not m:
            skipped.append(b[:80]); continue
        stmt, rest = m.group(1), m.group(2)
        if "jsonschema" not in stmt:
            continue
        # label
        lm = re.search(r"SELECT\s+'((?:[^']|'')*)'\s+AS\s+test", stmt)
        label = pg_unquote(lm.group(1)) if lm else stmt[:60]
        # function + args: find quoted literals with casts
        lits = re.findall(r"'((?:[^']|'')*)'::(jsonb|json|jsonschema_compiled)", stmt)
        # also jsonschema_compile('...'::jsonb) handled by the cast regex above
        # identify validator function
        fm = re.search(r"(jsonschema_(?:is_valid|validate)(?:_compiled)?)\s*\(", stmt)
        if not fm:
            skipped.append(("nofunc", label)); continue
        fn = fm.group(1)
        # Drop the label literal: lits only contains ::cast literals, label has no cast.
        args = [(pg_unquote(v), c) for v, c in lits]
        if len(args) < 2:
            skipped.append(("args", label, stmt.replace("\n", " ")[:120])); continue
        doc, schema = args[0][0], args[1][0]
        # result value: table is "  name | ... \n ------ \n  values \n (1 row)"
        rm = re.search(r"(?s)-{3,}.*?\n(.*?)\n\(1 row\)", rest)
        if not rm:
            skipped.append(("noresult", label)); continue
        row = rm.group(1)
        val = row.split("|", 1)[1].strip() if "|" in row else row.strip()
        # continuation lines (wrapped jsonb) - join all lines of the row
        if "\n" in val:
            val = " ".join(l.strip().lstrip("|").strip() for l in val.split("\n"))
        if "is_valid" in fn:
            if val not in ("t", "f"):
                skipped.append(("badbool", label, val)); continue
            cases.append({"label": label, "doc": doc, "schema": schema,
                          "kind": "bool", "expected": val == "t"})
        else:
            # jsonschema_validate → jsonb/json error array text; normalize compact
            try:
                arr = json.loads(val)
                compact = json.dumps(arr, separators=(",", ":"))
            except Exception:
                skipped.append(("badjson", label, val)); continue
            cases.append({"label": label, "doc": doc, "schema": schema,
                          "kind": "errors", "expected": compact})
    print(f"extracted {len(cases)} cases; skipped {len(skipped)}", file=sys.stderr)
    for s in skipped:
        print("  SKIP:", s, file=sys.stderr)
    with open("/root/repo/src/test/resources/golden_cases.json", "w") as f:
        json.dump(cases, f, indent=1)

if __name__ == "__main__":
    main()

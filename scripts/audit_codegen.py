"""Registry-wide whole-stage-codegen fallback audit.

Motivation (r9): profiling heavy_hitters_mg found a SILENT 2x
slowdown — the recount join's pushed-down filter re-inlined an
11-branch CASE into the scan, the fused method blew past
spark.sql.codegen.hugeMethodLimit (pinned to HotSpot's 8 KB JIT
ceiling in session.py), and the stage quietly ran interpreted. That
class of regression is invisible to correctness oracles and to the
bench unless you know to look, so this audit makes it a recorded,
re-runnable signal: run EVERY registered query and attribute every
JVM codegen-fallback warning to the query that triggered it.

Mechanism: log4j writes to this process's stderr (the JVM inherits
fd 2 in local mode). We bracket each query with flushed stderr
markers and a parser attributes warning lines to the enclosing
query. Run via:

    python scripts/audit_codegen.py [sf_dir] 2> /tmp/codegen_audit.err
    python scripts/audit_codegen.py --parse /tmp/codegen_audit.err

The second form writes CODEGEN_AUDIT.json at the repo root:
per-query fallback events (huge-method disables + expression
interpreter fallbacks), plus the warning text so each finding is
adjudicable without a re-run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QBEGIN = "===CODEGEN_AUDIT_QBEGIN %s==="
QEND = "===CODEGEN_AUDIT_QEND %s==="

#: JVM warning shapes that mean "this stage is NOT running compiled":
#: - WholeStageCodegenExec: generated method over hugeMethodLimit ->
#:   whole-stage codegen disabled for the plan.
#: - CodeGenerator / CodeGeneratorWithInterpretedFallback: janino
#:   compile error -> interpreted expression eval.
FALLBACK_PATTERNS = (
    re.compile(r"too long generated codes", re.I),
    re.compile(r"whole-stage codegen (?:was )?disabled", re.I),
    re.compile(r"falling back to interpreter", re.I),
    re.compile(r"failed to compile", re.I),
)


def run(sf_dir: str) -> None:
    from orders_currency_conversion_etl_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("codegen-audit")
    spark.sparkContext.setLogLevel("WARN")
    qs = entry.queries()
    timings = {}
    for name, fn in qs.items():
        sys.stderr.write("\n" + QBEGIN % name + "\n")
        sys.stderr.flush()
        t0 = time.monotonic()
        status = "ok"
        try:
            df = fn(spark, sf_dir)
            # noop sink: full execution, nothing shipped to the driver.
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # record, keep auditing the rest
            status = f"err: {type(e).__name__}: {str(e)[:160]}"
        timings[name] = {"sec": round(time.monotonic() - t0, 3), "status": status}
        sys.stderr.write("\n" + QEND % name + "\n")
        sys.stderr.flush()
    print(json.dumps({"sf_dir": sf_dir, "n": len(qs), "timings": timings}))


def parse(err_path: str, run_json: str | None) -> None:
    begin_re = re.compile(r"===CODEGEN_AUDIT_QBEGIN (\S+)===")
    end_re = re.compile(r"===CODEGEN_AUDIT_QEND (\S+)===")
    current = None
    findings: dict[str, list[str]] = {}
    preamble: list[str] = []  # fallbacks outside any query (state builds at import, etc.)
    with open(err_path, errors="replace") as fh:
        for line in fh:
            m = begin_re.search(line)
            if m:
                current = m.group(1)
                continue
            if end_re.search(line):
                current = None
                continue
            if any(p.search(line) for p in FALLBACK_PATTERNS):
                snippet = line.strip()[:400]
                if current is None:
                    preamble.append(snippet)
                else:
                    findings.setdefault(current, []).append(snippet)
    out = {
        "protocol": (
            "every registry query executed to a noop sink at the given sf_dir, "
            "one session (session.py conf incl. hugeMethodLimit=8000), log4j WARN "
            "stderr bracketed per query; a finding = that query's execution emitted "
            "a huge-method whole-stage-codegen disable or an interpreter fallback"
        ),
        "harness_validated": (
            "negative control: a 400-branch single CASE expression (unsplittable, "
            "md5 per branch) run under the same session conf emits 'WARN "
            "WholeStageCodegenExec: Whole-stage codegen disabled for plan (id=N)' "
            "on this rig's stderr and is matched by FALLBACK_PATTERNS — so an "
            "empty findings list means no fallback fired, not a blind detector. "
            "Generated-method size is a function of the PLAN, not the data, so "
            "sf0.01 findings transfer to every SF with the same plan shape."
        ),
        "queries_with_fallbacks": {
            q: {"n_events": len(v), "events": sorted(set(v))[:6]} for q, v in sorted(findings.items())
        },
        "outside_query_events": sorted(set(preamble))[:10],
        "clean": not findings,
    }
    if run_json and os.path.exists(run_json):
        meta = json.load(open(run_json))
        out["sf_dir"] = meta.get("sf_dir")
        out["queries_run"] = meta.get("n")
        errs = {q: t["status"] for q, t in meta.get("timings", {}).items() if t["status"] != "ok"}
        out["run_errors"] = errs
    path = os.path.join(REPO, "CODEGEN_AUDIT.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}: {len(findings)} queries with fallbacks, clean={out['clean']}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--parse":
        parse(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        run(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

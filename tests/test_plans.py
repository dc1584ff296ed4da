"""Physical-plan regression tests (the .explain audits).

A correct result from a wrong plan is a 100 TB incident waiting to
happen; these pin the plan shapes we designed. Details in
tools/explain_audit.py."""

from __future__ import annotations

from tools.explain_audit import run_audits


def test_plan_audits(spark):
    errors = run_audits(spark)
    assert not errors, "\n".join(errors)

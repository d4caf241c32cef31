"""Structural guard for the ORACLE_SELFCHECK contract (VERDICT r12
task 2): the doc pins the md5 of the exact ``__spark_entry__.py`` its
sweep verified. Round 12 shipped a registry edit without regenerating
the doc, leaving a claim no artifact backed. This test makes that
state a test failure: any registry change now forces a re-sweep
(tools/verify_oracle.py at sf0.01 + sf0.1, rendered by
tools/selfcheck_report.py) before the suite is green again.
"""

from __future__ import annotations

import hashlib
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_selfcheck_md5_pins_current_registry():
    doc = open(os.path.join(REPO, "ORACLE_SELFCHECK.md")).read()
    m = re.search(r"`__spark_entry__\.py` md5 `([0-9a-f]{32})`", doc)
    assert m, "ORACLE_SELFCHECK.md lost its registry md5 pin"
    actual = hashlib.md5(
        open(os.path.join(REPO, "__spark_entry__.py"), "rb").read()
    ).hexdigest()
    assert m.group(1) == actual, (
        "ORACLE_SELFCHECK.md is stale: it verified registry md5 "
        f"{m.group(1)} but __spark_entry__.py is now {actual}. Re-run "
        "the sweep (tools/verify_oracle.py at sf0.01 and sf0.1, logs "
        "under tools/out/) and regenerate via tools/selfcheck_report.py."
    )


def test_selfcheck_reports_no_failures():
    """The committed sweep must show zero FAIL cells — a doc that
    records failures is a red gate, not documentation."""
    doc = open(os.path.join(REPO, "ORACLE_SELFCHECK.md")).read()
    assert re.search(r"\|\s*FAIL", doc) is None

"""Execute the committed sqllogictest files on every CI run.

The analog of the reference registering its 2904 .test files into the unit
test binary (reference test/sqlite/sqllogic_test_runner.cpp,
test/unittest.cpp): every file under tests/sqllogic/ is one pytest case.
"""

import glob
import os

import pytest

from duckdb_cubit_tpu.testing.sqllogic import run_file

HERE = os.path.dirname(os.path.abspath(__file__))
FILES = sorted(glob.glob(os.path.join(HERE, "sqllogic", "*.test")))
# files ported from the reference corpus (tools/port_sqllogic.py); the
# not-yet-runnable remainder is documented in sqllogic/PORTED_SKIPLIST.md
PORTED = sorted(glob.glob(os.path.join(HERE, "sqllogic", "ported",
                                       "*.test")))


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f) for f in FILES])
def test_sqllogic_file(path):
    report = run_file(path)
    assert not report.skipped, f"{path} skipped (missing feature)"
    assert report.executed > 0


@pytest.mark.parametrize("path", PORTED,
                         ids=[os.path.basename(f) for f in PORTED])
def test_ported_reference_file(path):
    report = run_file(path)
    assert not report.skipped
    assert report.executed > 0

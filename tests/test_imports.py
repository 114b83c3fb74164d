"""refimpl is a TEST-ONLY differential oracle (VERDICT r3 #4): no
production module may import it.  Verified structurally — import every
gg2rdf_spark module except refimpl in a fresh interpreter and assert
refimpl never gets pulled into sys.modules."""

import pkgutil
import subprocess
import sys

import gg2rdf_spark

PROG = r"""
import importlib, sys
mods = {mods!r}
for m in mods:
    importlib.import_module(m)
assert "gg2rdf_spark.refimpl" not in sys.modules, "refimpl leaked into production imports"
print("CLEAN")
"""


def test_refimpl_not_imported_by_production_modules():
    mods = [
        name
        for _, name, _ in pkgutil.walk_packages(
            gg2rdf_spark.__path__, prefix="gg2rdf_spark.")
        if "refimpl" not in name
    ]
    assert len(mods) > 10
    out = subprocess.run(
        [sys.executable, "-c", PROG.format(mods=mods)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CLEAN" in out.stdout

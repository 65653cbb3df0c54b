#!/usr/bin/env python3
"""DEPRECATED shim — delegates to drivercheck.py, the exact replica of
the driver's gate semantics (type-tagged cell reprs, no float rounding,
pandas sort by all columns).

This file used to normalize floats to 9 significant digits, which was
LOSSIER than the driver's exact compare and hid 46 type-canonicalization
failures for two rounds. There is exactly ONE definition of green now:
drivercheck.py.

Usage: python3 scripts/localcheck.py <sfdir> <verify_outdir> [query ...]
"""
import os
import sys

sys.exit(os.spawnv(
    os.P_WAIT, sys.executable,
    [sys.executable, os.path.join(os.path.dirname(__file__), "drivercheck.py")]
    + sys.argv[1:]))

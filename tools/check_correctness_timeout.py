#!/usr/bin/env python3
"""Compatibility shim: the per-oracle wall-clock cap is now the DEFAULT
behavior of tools/check_correctness.py (round-10 postmortem — the
uncapped compare died mid-census and zeroed the round's artifact).
This entry point survives for callers/scripts that still invoke it;
it simply delegates with the same arguments.

Usage: python3 tools/check_correctness_timeout.py <sfDir> <verifyOutDir> [capSec]
"""
import os
import sys

if __name__ == "__main__":
    main_script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "check_correctness.py")
    os.execv(sys.executable, [sys.executable, main_script] + sys.argv[1:])

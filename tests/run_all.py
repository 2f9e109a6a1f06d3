"""Run the full conformance suite (reference tests/run_all.py aggregates by
star-import; here we just invoke pytest over the suite)."""
import os
import sys

import pytest

if __name__ == '__main__':
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root for the package
    sys.exit(pytest.main([here, '-q'] + sys.argv[1:]))

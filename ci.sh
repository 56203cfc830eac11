#!/usr/bin/env bash
# CI entry point: build the native core, run the full suite on a virtual
# 8-device CPU mesh (tests/conftest.py forces the CPU backend), then
# compile-check the driver entries.
set -euo pipefail
cd "$(dirname "$0")"

echo "== native core =="
make -C native

echo "== editable install =="
python -m pip install -q -e . 2>/dev/null || echo "(pip install skipped)"

echo "== test suite (virtual 8-CPU mesh) =="
python -m pytest tests/ -q

echo "== driver entries =="
python __graft_entry__.py

echo "CI OK"

#!/usr/bin/env bash
# Environment setup (parity with the reference's instalacion.sh):
# creates a venv and installs the package + extras.
set -euo pipefail
cd "$(dirname "$0")/.."
python3 -m venv .venv
source .venv/bin/activate
pip install --upgrade pip
pip install -e ".[test]"
echo "Done. Activate with: source .venv/bin/activate"

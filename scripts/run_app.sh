#!/usr/bin/env bash
# Launch the Gradio web UI (parity with the reference's iniciar.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
[ -d .venv ] && source .venv/bin/activate
exec python app.py

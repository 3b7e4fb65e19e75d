#!/usr/bin/env bash
# PIL-present test leg (VERDICT r12 item 8): the three PIL-gated tests in
# tests/test_multimodal.py skip wherever Pillow is not importable, so the
# PIL decode branch and the stdlib-vs-PIL parity assertions have never run
# green anywhere in CI. This script is the one-command recipe — mirror of
# tools/connector_smoke.sh — to execute them on any host that permits
# package installs, and record the result log in-repo.
#
# Why this cannot run inside the build sandbox: pip/apt installs are not
# permitted there and there is no network to fetch Pillow; the sandbox leg
# therefore runs the stdlib PNG/BMP decoders (live-tested) and records
# skips, never silent passes, for the PIL branch.
#
# Usage: tools/pil_smoke.sh [python]
set -euo pipefail

PY="${1:-python3}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="$REPO/tools/pil_smoke_last.log"
VENV="$(mktemp -d)/pilvenv"

# --system-site-packages: pyspark/pyarrow/pandas come from the host; the
# venv adds ONLY Pillow, so the smoke exercises the same engine bits.
"$PY" -m venv --system-site-packages "$VENV"
"$VENV/bin/pip" install --quiet pillow pytest

{
    echo "pil-smoke @ $(git -C "$REPO" rev-parse HEAD) ($(date -u +%FT%TZ))"
    "$VENV/bin/python" -c "import PIL; print('Pillow', PIL.__version__)"
    # the PIL-gated tests must RUN (not skip), and the whole multimodal
    # module must stay green with the PIL branch active — including the
    # verify()-based corrupt-body classification (ADVICE r12)
    "$VENV/bin/python" -m pytest "$REPO/tests/test_multimodal.py" -q -rs
} 2>&1 | tee "$LOG"

if grep -q "skipped.*PIL not installed" "$LOG"; then
    echo "pil-smoke: PIL tests still skipped — venv wiring broken" >&2
    exit 1
fi
echo "pil-smoke: PASS recorded at $LOG"

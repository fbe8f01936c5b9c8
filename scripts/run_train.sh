#!/usr/bin/env bash
# LipNet training launcher — the TPU-native analogue of the reference's
# run_train.sh (conda + cuDNN LD_LIBRARY_PATH + GPU probe + python train.py).
# Here there is nothing to wire up: JAX finds the TPU via its plugin; we just
# probe devices and forward args.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== avsync LipNet training ==="
python - <<'PY'
import jax
print(f"devices: {jax.devices()}")
PY

exec python -m avsync.cli train "$@"

"""HTTP server entry point — `python serve/api.py`.

Same env-var configuration and endpoint surface as the reference
(/root/reference/serve/api.py); implementation lives in
turkish_asr_tpu/serve/server.py (FastAPI when installed, stdlib fallback).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turkish_asr_tpu.serve.server import run_server  # noqa: E402

if __name__ == "__main__":
    run_server()

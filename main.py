#!/usr/bin/env python
"""Entry point: training, inference, and hyperparameter search.

Usage mirrors the reference framework's CLI (see README):
    python main.py --data_path data.csv --target_column gap --epochs 50
    python main.py --inference_csv new.csv --model_save_path model.npz
    python main.py --hyperparameter_file space.yaml --num_trials 20 ...
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    try:
        from aimnet_x2d_tpu.runner import main as runner_main

        return runner_main()
    except Exception as e:
        if os.environ.get("AIMNET_DEBUG"):
            traceback.print_exc()
        else:
            print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
            print("set AIMNET_DEBUG=1 for a full traceback", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())

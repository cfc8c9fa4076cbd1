#!/usr/bin/env python
"""Run the full multi-epoch 4D pipeline from a YAML config.

Counterpart of the reference's main_dev.py batch driver.

Usage: python scripts/run_pipeline.py config.yaml
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    args = ap.parse_args()

    from icepy4d_tpu import Pipeline
    from icepy4d_tpu.utils import setup_logger

    setup_logger()
    pipe = Pipeline(args.config)
    epoches = pipe.run()
    print(f"processed {len(epoches)} epochs")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Run the full multi-epoch 4D pipeline from a YAML config.

Counterpart of the reference's main_dev.py batch driver, plus the
distributed modes the reference never had:

  python scripts/run_pipeline.py config.yaml
  python scripts/run_pipeline.py config.yaml --batched          # DP mesh
  python scripts/run_pipeline.py config.yaml --distributed \
      --coordinator host:1234 --num-processes 4 --process-id 0  # slices
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--batched", action="store_true",
                    help="mesh-batched epochs (data-parallel over chips)")
    ap.add_argument("--watch", action="store_true",
                    help="continuous monitoring: poll for new epochs")
    ap.add_argument("--poll-interval", type=float, default=60.0)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-process epoch distribution "
                         "(jax.distributed; one process per slice)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port "
                         "(or JAX_COORDINATOR_ADDRESS)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    from icepy4d_tpu import Pipeline
    from icepy4d_tpu.utils import setup_logger

    setup_logger()
    if args.distributed:
        from icepy4d_tpu.parallel.distributed import init_distributed

        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
        pipe = Pipeline(args.config)
        epoches = pipe.run_distributed()
    elif args.watch:
        pipe = Pipeline(args.config)
        epoches = pipe.watch(poll_interval=args.poll_interval)
    elif args.batched:
        pipe = Pipeline(args.config)
        epoches = pipe.run_batched()
    else:
        pipe = Pipeline(args.config)
        epoches = pipe.run()
    print(f"processed {len(epoches)} epochs")


if __name__ == "__main__":
    main()

"""Multi-host batch inference: each process handles a slice of the prompts.

Replaces the reference's NCCL DDP wrapper (scripts/evaluation/ddp_wrapper.py:
8-47 + inference.py:350-356 prompt slicing): pure data parallelism with zero
inter-host communication during sampling. On a multi-host TPU slice, launch
one process per host:

  python scripts/distributed_inference.py --coordinator <addr> \
      --num_processes N --process_id i ... (remaining args as inference.py)

Within each process, the local devices additionally form a (dp, sp) mesh for
sharded sampling of each clip.

The parsed namespace is handed to inference.main() directly — no argv
re-parsing, no monkeypatching (args are parsed exactly once).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inference import get_parser, main as run_local  # noqa: E402


def main():
    parser = get_parser()
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port")
    parser.add_argument("--num_processes", type=int, default=1)
    parser.add_argument("--process_id", type=int, default=0)
    args = parser.parse_args()

    import jax

    if args.coordinator and args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    run_local(args, prompt_shard=(args.process_id, args.num_processes))


if __name__ == "__main__":
    main()

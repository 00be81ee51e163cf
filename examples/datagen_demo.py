"""Batched-env datagen demo (BASELINE config 5): 4,096 envs x 256 agents
rolling out with vision observations — RL-style data generation. Prints
agent-frames/s and the trajectory tensor shapes.

    python examples/datagen_demo.py [--envs 4096] [--agents 256]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from nenbody_tpu import Scene, SimConfig, VisionConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--agents", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=8)
    args = ap.parse_args()

    cfg = SimConfig(
        n=args.agents, controller="gravity", vision=VisionConfig(width=64)
    )
    scene = Scene(cfg)
    batch = scene.spawn_envs(args.envs, seed=0)

    # warm up / compile — force a host fetch: block_until_ready may return
    # before a remote compile finishes (see .claude/skills/verify/SKILL.md)
    _, traj = scene.rollout(batch, args.horizon, record=("obs",))
    np.asarray(traj["obs"][:1, :1])

    t0 = time.perf_counter()
    final, traj = scene.rollout(batch, args.horizon, record=("obs",))
    np.asarray(traj["obs"][:1, :1])  # force full execution through the fetch
    dt = time.perf_counter() - t0

    frames = args.envs * args.agents * args.horizon
    print(f"obs tensor: {traj['obs'].shape}  ({traj['obs'].dtype})")
    print(f"{frames} agent-frames in {dt:.3f}s -> {frames/dt:.3e} agent-frames/s")


if __name__ == "__main__":
    main()

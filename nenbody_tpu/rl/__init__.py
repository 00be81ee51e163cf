"""RL-style control on top of the sim: vision env, policies, training.

The reference's stated purpose is to be a substrate "for simple control
algorithms and computer vision processing" (README.md:4); its controllers
are hardcoded rules (src/main.rs:381-526). This package closes the loop the
reference only gestures at: agents act on their 1D vision lines through
scripted or learned policies (feedforward MLP or GRU memory — the eye line
is a partial observation), rolled out in batched envs (BASELINE.json
config 5), trained five ways — REINFORCE (`train`, recurrent variant
included), REINFORCE+value baseline (`ac`), PPO (`ppo`), antithetic
evolution strategies (`es`), and analytic policy gradients through the
differentiable Pallas physics (`apg`) — with
dataset export (`datagen`) and behavior cloning (`bc`) closing the
generate->train->deploy loop.
"""

from . import ac, apg, bc, datagen, env, es, policy, scripted, train

__all__ = ["ac", "apg", "bc", "datagen", "env", "es", "policy", "scripted", "train"]

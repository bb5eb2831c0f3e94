"""Roofline accounting for train_iter (VERDICT round-1 item 4).

Counts the matmul FLOPs one PPO iteration performs per env step —
rollout forward passes plus num_sgd_iter fwd+bwd passes over every
sample — and converts a measured training throughput into model-FLOPs/s
and fraction of the chip's matmul roofline.  The point: at TPU geometry
the XLA train step IS the fast path; this quantifies how close.

usage: python scripts/roofline.py <run.yml> <measured_env_steps_per_sec>
"""

import sys

sys.path.insert(0, ".")

HIDDEN = 256
OBS = 6
LOGITS = 10

# Per-sample matmul MACs of one forward pass: policy tower + value tower.
FWD_MACS = (OBS * HIDDEN + HIDDEN * HIDDEN + HIDDEN * LOGITS) + \
           (OBS * HIDDEN + HIDDEN * HIDDEN + HIDDEN * 1)

# v5e (v5 lite) dense peak: ~197 TFLOP/s bf16; float32 matmuls run at
# roughly half that through the MXU.
PEAK_F32 = 98.0e12
PEAK_BF16 = 197.0e12


def flops_per_env_step(num_sgd_iter: int) -> float:
    fwd = 2.0 * FWD_MACS                      # rollout action selection
    # Each sample is revisited num_sgd_iter times; backward ~= 2x forward.
    train = num_sgd_iter * 3.0 * 2.0 * FWD_MACS
    return fwd + train


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    run_yml, rate = argv[0], float(argv[1])

    from q1physrl_tpu.algo.train import load_run_config

    run = load_run_config(run_yml)
    f = flops_per_env_step(run.ppo.num_sgd_iter)
    total = f * rate
    print(f"geometry: {run.ppo.num_envs} envs x {run.ppo.rollout_length} "
          f"steps, {run.ppo.num_sgd_iter} SGD epochs, minibatch "
          f"{run.ppo.sgd_minibatch_size}")
    print(f"matmul FLOPs per env step: {f/1e6:.2f} M "
          f"(rollout {2*FWD_MACS/1e3:.0f} k + "
          f"SGD {run.ppo.num_sgd_iter*6*FWD_MACS/1e6:.2f} M)")
    print(f"measured: {rate/1e6:.2f} M env-steps/s -> "
          f"{total/1e12:.1f} TFLOP/s model FLOPs")
    print(f"fraction of f32 matmul roofline (~{PEAK_F32/1e12:.0f} TFLOP/s): "
          f"{total/PEAK_F32:.1%}")
    print(f"fraction of bf16 roofline (~{PEAK_BF16/1e12:.0f} TFLOP/s): "
          f"{total/PEAK_BF16:.1%}")


if __name__ == "__main__":
    main()

"""Minimal reproducer: the full Mask R-CNN program at 512^2 input crashes the
remote TPU worker ("TPU worker crashed" / tunnel drop), while the identical
program at 1024^2 runs fine.

Status: BACKEND-OWNED bug (axon remote TPU relay, observed round 2).  The
framework fails fast on this shape via ``config.KNOWN_BAD_TPU_INPUT_SIZES``;
run this script after backend updates to re-check.

Bisect notes (round 2, v5e-1 via axon tunnel, jax 0.9.0):
  * full model @ 1024^2, batch 8, bf16 .......... OK (production config)
  * full model @ 512^2, batch 8, bf16 ........... worker CRASH, ~compile end
  * full model @ 512^2, batch 1, fp32 ........... worker CRASH (so neither
    batch size nor dtype is the trigger)
  * backbone+FPN only @ 512^2 ................... OK
  * resize_bilinear 512 -> 512 alone ............ OK
  -> the crash needs the full program (RPN/heads) at the 512 canvas; most
     likely an XLA:TPU lowering or relay serialization issue for that shape
     mix, not anything in this repo's model code.

Usage (WARNING — on the known-bad backend this kills the single-tenant TPU
worker; wait a few minutes before the next TPU job):

    TD_ALLOW_UNSAFE_INPUT_SIZE=1 python tools/repro_512_crash.py [size]

Exit 0 = the shape now works (remove it from KNOWN_BAD_TPU_INPUT_SIZES).
"""

import sys

import numpy as np


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp
    from treedetection_tpu.models.mask_rcnn import MaskRCNNConfig, create_model

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = MaskRCNNConfig(depth=101, input_size=size, bf16=True)
    model, params = create_model(cfg)

    @jax.jit
    def fwd(x):
        return model.apply(params, x)

    x = jnp.asarray(np.zeros((8, size, size, 3), dtype=np.float32))
    print(f"dispatching full Mask R-CNN @ {size}^2 batch 8 ...")
    out = fwd(x)
    print("scores:", np.asarray(out.scores)[:1, :4])
    print(f"OK — {size}^2 executed; if this is a known-bad size, remove it "
          f"from treedetection_tpu.config.KNOWN_BAD_TPU_INPUT_SIZES")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

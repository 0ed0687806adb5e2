"""Engine state pytree (replaces state.fut).

The reference threads one opaque functional state value through every
entry point (state.fut:8-19); here it is a flax.struct dataclass — traced
leaves for everything that changes per frame (so key presses don't
recompile) and static fields for anything that changes compiled shapes or
code structure (dimensions, subsampling, render mode, transmitter kind).

Being a pytree, the whole engine state checkpoints for free
(np.savez / orbax), covering the reference's implicit
"state is the checkpoint" design (SURVEY.md section 5).
"""

from __future__ import annotations

import jax
from flax import struct

from tracer_tpu.models import camera as cam_mod
from tracer_tpu.models import scene as scene_mod


@struct.dataclass
class EngineState:
    # --- static (recompile when changed)
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    subsampling: int = struct.field(pytree_node=False)
    render_mode: str = struct.field(pytree_node=False)       # "color"|"distance"
    transmitter_kind: str = struct.field(pytree_node=False)  # camera.TRANSMITTER_*
    cam_conf_id: int = struct.field(pytree_node=False)

    # --- traced
    seed: jax.Array       # u32 scalar
    nonce: jax.Array      # u32 scalar; per-frame stream counter
    img: jax.Array        # (h_sub, w_sub, 3) f32 accumulated frame
    n_frames: jax.Array   # u32 scalar
    ambience: jax.Array   # (6, 2) sky spectrum
    mode: jax.Array       # bool scalar: progressive accumulation on
    cam: cam_mod.Camera
    scene: scene_mod.Scene

    @property
    def sub_dims(self) -> tuple[int, int]:
        """(w, h) at the current subsampling (integrator.fut:105-107)."""
        ss = self.subsampling
        return (-(-self.width // ss), -(-self.height // ss))

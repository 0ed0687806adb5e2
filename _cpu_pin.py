"""Force jax onto N virtual CPU host devices — the one shared copy of the
platform-pinning dance (tests/conftest.py, __graft_entry__.dryrun_multichip
and benchmarks/make_goldens.py all need it).

Why it exists: this environment's sitecustomize imports jax at interpreter
start and pins jax_platforms to the tunneled 'axon' TPU via jax.config,
which overrides JAX_PLATFORMS and would route every op through the tunnel
(and hang forever when the tunnel is down). CPU-mesh consumers must force
the config back BEFORE any jax API materializes a backend.

Why it lives at the repo root, OUTSIDE the tracer_tpu package: importing
the package evaluates module-level jnp constants (ops/linalg.py WORLD_UP
et al.), which materializes the default backend — so a pin helper inside
the package could never run early enough for its own importers.
"""

import os


def maybe_force_from_env(n_devices: int = 1) -> bool:
    """Honor an explicit JAX_PLATFORMS=cpu request in a CLI tool.

    The env var alone is NOT enough here (sitecustomize re-pins
    jax_platforms via jax.config at interpreter start), so every CLI
    entry point that documents "CPU when forced" calls this before any
    jax API materializes a backend. Returns True when CPU was forced."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        force_cpu(n_devices)
        return True
    return False


def force_cpu(n_devices: int = 8) -> None:
    """Pin jax to >= n_devices virtual CPU devices.

    Safe to call more than once. Handles the already-materialized case
    (backend created before the pin) by clearing backends and re-pinning.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    if jax.default_backend() != "cpu":  # backend already materialized
        # jax.clear_backends was removed in jax 0.5+; the supported home
        # is jax.extend.backend (verified present in the installed 0.9.0)
        try:
            clear = jax.clear_backends  # type: ignore[attr-defined]
        except AttributeError:
            from jax.extend.backend import clear_backends as clear
        clear()
        jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} cpu devices, got {len(jax.devices())}")

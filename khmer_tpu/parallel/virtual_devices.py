"""Force a virtual multi-device CPU platform for tests and dry runs.

Some environments (the axon TPU tunnel) register their PJRT plugin at
interpreter startup and pin jax_platforms, which makes the usual
JAX_PLATFORMS / --xla_force_host_platform_device_count environment
knobs ineffective. This helper restores a clean N-device CPU world via
the config API + a backend reset.
"""


def force_cpu_devices(n: int) -> int:
    """Ensure jax sees n CPU devices as the only platform.

    Returns the resulting device count. Safe to call repeatedly.
    """
    import os

    import jax
    from jax._src import xla_bridge as xb

    plats = (jax.config.jax_platforms
             or os.environ.get("JAX_PLATFORMS", ""))
    if plats.split(",")[0] == "cpu":
        # don't touch anything if the CPU world is already big enough
        try:
            if len(jax.devices()) >= n:
                return len(jax.devices())
        except Exception:
            pass
    jax.config.update("jax_platforms", "cpu")
    try:
        # must reset before jax_num_cpu_devices may be changed
        xb._clear_backends()
    except Exception:
        pass
    jax.config.update("jax_num_cpu_devices", n)
    ndev = len(jax.devices())
    # keep numpy->jax transfers off any lingering non-CPU client
    jax.config.update("jax_default_device", jax.devices()[0])
    return ndev

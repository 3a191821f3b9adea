"""Force a virtual multi-device CPU platform for tests and dry runs.

Some environments (the axon TPU tunnel) register their PJRT plugin at
interpreter startup and pin jax_platforms, which makes the usual
JAX_PLATFORMS / --xla_force_host_platform_device_count environment
knobs ineffective. This helper restores a clean N-device CPU world via
the config API.

CRITICAL ordering constraint: jax_num_cpu_devices is silently ignored
once any backend has been initialized — even after an
xla_bridge._clear_backends() — so the device count must be set before
the first jax.devices() call in the process.
"""


def force_cpu_devices(n: int) -> int:
    """Ensure jax sees >= n CPU devices as the only platform.

    Must run before jax backends initialize (it raises otherwise,
    unless the initialized world already satisfies the request).
    Returns the resulting device count.
    """
    import jax
    from jax._src import xla_bridge as xb

    if getattr(xb, "_backends", None):
        # backends are live: the CPU client is frozen, so we can only
        # succeed if the existing world already fits
        devs = jax.devices()
        if devs[0].platform == "cpu" and len(devs) >= n:
            return len(devs)
        raise RuntimeError(
            "cannot resize the CPU device count after jax backends "
            "initialized (have %d %s device(s), need %d cpu); call "
            "force_cpu_devices earlier in the process"
            % (len(devs), devs[0].platform, n))

    jax.config.update("jax_platforms", "cpu")
    try:
        xb._clear_backends()
    except Exception:
        pass
    jax.config.update("jax_num_cpu_devices", n)
    ndev = len(jax.devices())
    # keep numpy->jax transfers off any lingering non-CPU client
    jax.config.update("jax_default_device", jax.devices()[0])
    return ndev

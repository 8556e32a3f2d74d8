"""xfemm_tpu: a TPU-native 2-D finite-element electromagnetics framework.

Re-implements the capabilities of xfemm (FEMM 4.2 lineage: magnetostatics,
AC magnetics, heat flow, electrostatics on first-order triangle meshes)
as a JAX library: host-side geometry/meshing/packing, device-side batched
assembly + preconditioned CG, shard_map domain decomposition for
multi-chip.
"""

import os as _os


def _honor_platform_env() -> None:
    """Make JAX_PLATFORMS authoritative: TPU plugin site-hooks (e.g.
    axon) can register themselves and override the environment variable,
    so re-assert the user's choice through jax.config (see also
    tests/conftest.py)."""
    plat = _os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    # Only canonical names: a site plugin's own platform string (e.g.
    # "axon") is honored by the plugin itself, and pushing it through
    # jax.config poisons backend init ("not in the list of known
    # backends") because the config path validates against built-ins.
    if not set(plat.split(",")) <= {"cpu", "tpu", "gpu", "cuda", "rocm"}:
        return
    try:
        import jax
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


_honor_platform_env()


def _machine_fingerprint() -> str:
    """Short hash of the host CPU's identity + ISA feature flags, used
    to key the persistent compile cache so AOT executables never cross
    machine types."""
    import hashlib
    import platform as _plat

    # XLA_FLAGS participates: flags like
    # --xla_force_host_platform_device_count change the CPU backend's
    # codegen pseudo-features (prefer-no-scatter/gather), and loading
    # those entries from a plain run trips the AOT feature check
    parts = [_plat.machine(), _plat.processor(),
             _os.environ.get("XLA_FLAGS", "")]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name")):
                    parts.append(line.strip())
                    if line.startswith(("flags", "Features")):
                        break
    except OSError:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: TPU compiles here cost tens of
    seconds through the device tunnel, so cache them across processes."""
    if _os.environ.get("XFEMM_TPU_NO_COMPILE_CACHE"):
        return
    import jax
    # separate cache dirs per platform AND host machine: executables
    # AOT-compiled on another machine (or by a remote compile service)
    # must not be loaded by the local CPU backend -- a machine-feature
    # mismatch can SIGILL (cpu_aot_loader warns about exactly this)
    platform = _os.environ.get("JAX_PLATFORMS", "default") or "default"
    cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "xfemm_tpu",
                      f"xla_cache_{platform.replace(',', '_')}_"
                      f"{_machine_fingerprint()}"))
    try:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is an optimization, never a hard failure
        pass


_enable_compile_cache()

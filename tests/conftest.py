"""Test harness: force JAX onto 8 virtual CPU devices.

All unit/integration tests run on the CPU backend with an 8-device virtual
topology so sharding/collective code paths are exercised without TPU
hardware (SURVEY.md §4 test strategy).

NB: this environment presets JAX_PLATFORMS=axon (a TPU tunnel plugin) and
the plugin outranks a plain env override — `jax.config.update` after import
is what actually pins the CPU backend. Without it the whole suite silently
runs over the TPU tunnel (slow, single-device).
"""

import os

# figure artifacts keep identical content at a smaller raster — the suite
# renders hundreds of matplotlib figures on this 1-core host (reporting._dpi)
os.environ.setdefault("GDPT_PLOT_DPI_SCALE", "0.3")
# artifact-surface mode: most figures skip rasterization (a real 1x1 PNG is
# still written at the contracted path); a deterministic 1-in-8 sample by
# filename hash renders fully (reporting._savefig). Set GDPT_FAST_FIGURES=0
# to force full renders for a figure-content investigation.
os.environ.setdefault("GDPT_FAST_FIGURES", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    f"test harness expected 8 virtual CPU devices, got {jax.devices()}"
)

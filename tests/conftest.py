"""Test configuration: run everything on a virtual 8-device CPU mesh in float64.

The reference experiments pin the CPU platform and enable x64 globally
(reference: experiments/1_van_der_pol/vdp.py:47-48); tests mirror that so the
differential oracles (scipy / native RK) are meaningful. Multi-chip sharding
is exercised on a virtual 8-device host mesh, per the TPU-rebuild test plan
(SURVEY.md section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS at interpreter start, so the env var alone is not
# enough -- override through the config API before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

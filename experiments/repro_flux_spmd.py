"""Repro: FLUX GSPMD modulation-spec thrash (VERDICT r3 weak #3).

Runs the FLUX sampled leg on an 8-device virtual CPU mesh and counts
spmd_partitioner.cc "Involuntary full rematerialization" warnings on
stderr. Run:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python experiments/repro_flux_spmd.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents  # noqa: E402
from tpdm_tpu.models.tpm import TimePredictor  # noqa: E402
from tpdm_tpu.parallel.mesh import make_mesh  # noqa: E402
from tpdm_tpu.train.config import RLOOConfig  # noqa: E402
from tpdm_tpu.train.flux_agent import FluxAgent  # noqa: E402


def main(mesh_shape=(2, 2, 2)):
    d, f, t = mesh_shape
    mesh = make_mesh(jax.devices()[:8], data=d, fsdp=f, tensor=t)
    fcfg = FluxConfig.toy()
    flux = Flux(fcfg)
    lat = jnp.zeros((2, 4, 8, 8))
    tokens, img_ids = pack_latents(lat)
    n_txt = 5
    fparams = flux.init(
        jax.random.PRNGKey(1), tokens, img_ids,
        jnp.zeros((2, n_txt, fcfg.txt_dim)), jnp.zeros((2, n_txt, 3)),
        jnp.ones((2,)), jnp.zeros((2, fcfg.vec_dim)), jnp.full((2,), 3.5),
    )
    cfg = RLOOConfig(
        per_device_train_batch_size=2, rloo_k=2, max_inference_steps=2,
        total_episodes=2 * d * f, learning_rate=1e-4, kl_coef=0.0,
        save_steps=0,
    )
    agent = FluxAgent(
        flux, fparams, cfg,
        tpm=TimePredictor(
            conv_out_channels=4, in_channels=2 * fcfg.hidden_size,
            temb_dim=fcfg.hidden_size,
        ),
        latent_size=8, latent_channels=4,
    ).shard(mesh)
    tpm_params = agent.init_tpm_params(jax.random.PRNGKey(3))

    rng = np.random.default_rng(0)
    b = 8  # per-shard batch >= 2 on every factorization
    from tpdm_tpu.parallel.sharding import shard_batch

    batch = shard_batch(
        {
            "prompt_embeds": jnp.asarray(
                rng.normal(size=(b, n_txt, fcfg.txt_dim)), jnp.float32
            ),
            "pooled_prompt_embeds": jnp.asarray(
                rng.normal(size=(b, fcfg.vec_dim)), jnp.float32
            ),
        },
        mesh,
    )
    out = agent.sample(tpm_params, batch, jax.random.PRNGKey(5), predict=True)
    print("num_steps:", int(out.num_steps))
    print("sigmas[0]:", np.asarray(out.sigmas[0]))


if __name__ == "__main__":
    shape = tuple(
        int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else (2, 2, 2))
    )
    main(shape)

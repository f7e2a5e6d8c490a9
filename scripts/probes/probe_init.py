import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
from flowmap_tpu.model import BackboneMidasCfg, ExtrinsicsProcrustesCfg, IntrinsicsSoftminCfg, ModelCfg, RegressionCfg
from flowmap_tpu.training.overfit import OverfitTrainerCfg, init_train_state

model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
    intrinsics=IntrinsicsSoftminCfg(regression=RegressionCfg(after_step=1000, window=100)),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
t0 = time.time()
state, opt = init_train_state(model_cfg, OverfitTrainerCfg(), 30, (96, 128))
jax.block_until_ready(state.params)
print(f"init_train_state: {time.time()-t0:.1f}s")

import time, numpy as np, jax, jax.numpy as jnp
import bench as B
from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.batch import Batch
from mmfn_tpu.models import build_model
from mmfn_tpu.ops.radar import radar_adjacency

rng = np.random.default_rng(0)
cfg = GlobalConfig()
model = build_model(cfg, "rad")
init_inp = B.make_inputs(1, rng)
init_batch = Batch(image=init_inp["image"], lidar_bev=jnp.zeros((1,256,256,2)),
    lanes=init_inp["lanes"], lane_num=init_inp["lane_num"], radar=init_inp["radar"],
    radar_adj=radar_adjacency(init_inp["radar"]), target_point=init_inp["target_point"],
    velocity=init_inp["velocity"])
variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, init_batch, False)
pipe = B.pipeline_fn(model)

def bf16_tree(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x, t)

variables_bf16 = bf16_tree(variables)

def bf16_pipe(variables, inp):
    inp = dict(inp)
    for k in inp:
        if inp[k].dtype == jnp.float32 and k != "points":  # bin math stays f32
            inp[k] = inp[k].astype(jnp.bfloat16)
    return pipe(variables, inp)

for batch in (16, 32):
    inp = B.make_inputs(batch, rng)
    t = B.timed_loop(bf16_pipe, variables_bf16, inp, 50)
    print(f"bf16 batch {batch}: {t*1e3:.2f} ms/step -> {batch/t:.0f} fps")

# bf16 accuracy vs f32 at batch 2
inp = B.make_inputs(2, rng)
out32 = np.asarray(jax.jit(pipe)(variables, inp))
out16 = np.asarray(jax.jit(bf16_pipe)(variables_bf16, inp)).astype(np.float32)
print("bf16 waypoint max |diff| vs f32:", np.abs(out32-out16).max(), "rel:", np.abs(out32-out16).max()/np.abs(out32).max())

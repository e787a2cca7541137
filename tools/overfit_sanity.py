"""Learning sanity: synthetic constant-disparity stereo; train tiny IGEV on
TPU and watch the final-iteration EPE fall."""
import time, numpy as np, jax, jax.numpy as jnp
from anystereo_tpu.config import ModelConfig, TrainConfig
from anystereo_tpu.nn.model import AnyStereo, dense_query_coords
from anystereo_tpu.train.optimizer import make_optimizer
from anystereo_tpu.train.state import create_train_state
from anystereo_tpu.train.step import make_train_step

D_TRUE = 6.0
b, h, w, q = 2, 64, 128, 1024
rng = np.random.RandomState(0)

def make_pair():
    # smooth random texture so matching is well-posed
    import cv2
    tex = rng.rand(h, w + 32, 3).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), 1.5) * 255
    left = tex[:, 32:]
    right = tex[:, 32 - int(D_TRUE):w + 32 - int(D_TRUE)]
    return left, right

pairs = [make_pair() for _ in range(b)]
left = jnp.asarray(np.stack([p[0] for p in pairs]))
right = jnp.asarray(np.stack([p[1] for p in pairs]))
coords = jnp.asarray((rng.rand(b, q, 2).astype(np.float32) * 2 - 1) * 0.95)
gt = jnp.full((b, q), D_TRUE, jnp.float32)
batch = {
    "left": left, "right": right, "coords": coords, "gt": gt,
    "valid": jnp.ones((b, q), jnp.float32),
    "scale": jnp.ones((b,), jnp.float32),
    "gt_low": jnp.full((b, h//4, w//4), D_TRUE/4.0, jnp.float32),
}
cfg = ModelConfig(max_disp=64)
tcfg = TrainConfig(train_iters=4, batch_size=b, lr=4e-4, num_steps=400,
                   supervise_init=True, warmup_frac=0.05)
model = AnyStereo(cfg)
variables = jax.jit(lambda k: model.init(k, left, right, iters=1, coords=coords))(jax.random.PRNGKey(0))
tx = make_optimizer(tcfg.lr, tcfg.weight_decay, tcfg.num_steps, tcfg.grad_clip, tcfg.warmup_frac)
state = create_train_state(variables["params"], tx)
step = make_train_step(model, tcfg)
t0 = time.time()
for i in range(400):
    state, m = step(state, batch)
    if i % 50 == 0 or i == 399:
        print(f"step {i:4d}  loss {float(m['loss']):8.4f}  epe {float(m['epe']):7.3f}  1px {float(m['1px']):.3f}", flush=True)
print(f"total {time.time()-t0:.1f}s", flush=True)
epe = float(m["epe"])
print("LEARNED" if epe < 1.0 else "NOT_LEARNED", f"final epe {epe:.3f}")

"""Train the mouth localizer on the synthetic corpus and bundle the weights.

The synthetic corpus knows the mouth box by construction
(avsync.data.synthetic.mouth_box), so this is fully supervised box
regression: smooth-L1 on the corners + an IoU term. The resulting ~7k-param
net ships as avsync/models/localizer_weights.npz and powers
DataConfig.roi_mode="model" (the dlib-landmark replacement).

Run: python scripts/train_localizer.py [steps] [out.npz]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from avsync.data.synthetic import make_localizer_batch
    from avsync.models.localizer import (
        MouthLocalizer,
        NET_HW,
        iou,
        localize_frames,
        save_params,
    )

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    out = sys.argv[2] if len(sys.argv) > 2 else None

    import os

    rng = np.random.default_rng(0)
    t0 = time.time()
    cache = "/tmp/localizer_dataset.npz"
    from avsync.ops.image import resize_bilinear

    def prep(frames):
        # pre-resize to the net geometry on host so the train step is static
        x = jnp.asarray(frames)
        x = x / jnp.maximum(x.max(axis=(1, 2), keepdims=True), 1e-6)
        return np.asarray(resize_bilinear(x, NET_HW))

    if os.path.exists(cache):
        z = np.load(cache)
        X, Y, frames_a, boxes_a = z["X"], z["Y"], z["fa"], z["ba"]
    else:
        print("generating training set...", flush=True)
        # mixed geometries so the resize-to-48x96 front end sees both aspect
        # treatments; boxes are normalized, so they concatenate trivially
        frames_a, boxes_a = make_localizer_batch(rng, 1536, height=200, width=400)
        frames_b, boxes_b = make_localizer_batch(rng, 512, height=120, width=160)
        X = np.concatenate([prep(frames_a), prep(frames_b)])
        Y = np.concatenate([boxes_a, boxes_b])
        np.savez(cache, X=X, Y=Y, fa=frames_a[:4], ba=boxes_a[:4])
    n_val = 256
    Xv, Yv = X[:n_val], Y[:n_val]
    Xt, Yt = X[n_val:], Y[n_val:]
    print(f"dataset: train={len(Xt)} val={n_val} ({time.time() - t0:.1f}s)",
          flush=True)

    model = MouthLocalizer()
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key}, jnp.zeros((1, *NET_HW, 1)))["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def augment(x, key):
        """Photometric robustness augmentation (jitted, on-device): contrast
        and brightness jitter, additive noise, and a random occluding
        rectangle — boxes are photometric-invariant so labels don't change.
        The net must keep localizing under degraded/occluded video (the
        dlib path it replaces handled real-world contrast)."""
        kc, kb, kn, ko, kv = jax.random.split(key, 5)
        B, H, W = x.shape
        a = jax.random.uniform(kc, (B, 1, 1), minval=0.5, maxval=1.5)
        b = jax.random.uniform(kb, (B, 1, 1), minval=-0.2, maxval=0.2)
        noise = jax.random.normal(kn, x.shape) * jax.random.uniform(
            kv, (B, 1, 1), minval=0.0, maxval=0.08
        )
        x = jnp.clip(x * a + b + noise, 0.0, 1.0)
        # occluder: one rectangle per sample, up to 1/4 of each dimension,
        # filled with a random constant
        k1, k2, k3, k4, k5 = jax.random.split(ko, 5)
        oy = jax.random.uniform(k1, (B, 1, 1))
        ox = jax.random.uniform(k2, (B, 1, 1))
        ohh = jax.random.uniform(k3, (B, 1, 1), minval=0.05, maxval=0.25)
        oww = jax.random.uniform(k4, (B, 1, 1), minval=0.05, maxval=0.25)
        fill = jax.random.uniform(k5, (B, 1, 1))
        yy = (jnp.arange(H) + 0.5)[None, :, None] / H
        xx = (jnp.arange(W) + 0.5)[None, None, :] / W
        occ = ((yy >= oy) & (yy < oy + ohh) & (xx >= ox) & (xx < ox + oww))
        return jnp.where(occ, fill, x)

    def loss_fn(params, x, y):
        pred = model.apply({"params": params}, x[..., None])
        l1 = jnp.abs(pred - y).mean()
        return l1 + (1.0 - iou(pred, y).mean())

    @jax.jit
    def train_step(params, opt_state, x, y, key):
        x = augment(x, key)
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def val_iou(params, x, y):
        pred = model.apply({"params": params}, x[..., None])
        return iou(pred, y).mean()

    B = 128
    order = np.arange(len(Xt))
    for step in range(steps):
        if step % (len(Xt) // B) == 0:
            rng.shuffle(order)
        idx = order[(step * B) % len(Xt): (step * B) % len(Xt) + B]
        params, opt_state, loss = train_step(
            params, opt_state, Xt[idx], Yt[idx], jax.random.fold_in(key, step)
        )
        if step % 200 == 0 or step == steps - 1:
            v = float(val_iou(params, Xv, Yv))
            print(f"step {step:5d}  loss={float(loss):.4f}  val_iou={v:.3f}",
                  flush=True)

    final_iou = float(val_iou(params, Xv, Yv))
    print(f"final val IoU: {final_iou:.3f}")
    if out:
        save_params(params, out)
        print(f"saved -> {out}")
    else:
        save_params(params)
        print("saved -> avsync/models/localizer_weights.npz")

    # sanity: the full inference path (raw frames -> boxes) agrees
    chk = localize_frames(params, jnp.asarray(frames_a[:4]))
    print("sample boxes:", np.round(np.asarray(chk), 3).tolist())
    print("truth boxes: ", np.round(boxes_a[:4], 3).tolist())


if __name__ == "__main__":
    main()

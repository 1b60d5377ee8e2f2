"""Train the ORB vocabulary from synthetic-scene descriptors.

The reference ships a pre-trained DBoW2 vocabulary (ORBvoc.txt, loaded at
src/System.cc:81-84). We train our own from descriptors the framework itself
produces: many rendered viewpoints of varied synthetic scenes. ~100k
descriptors -> k=10, L=4 tree (10k words), saved to
orb_slam2v2_1_tpu/data/vocab.npz (~400 KB).

Run: python tools/train_vocab.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from orb_slam2v2_1_tpu.ops import orb, vocab
    from orb_slam2v2_1_tpu.utils import synthetic
    from orb_slam2v2_1_tpu.ops import lie

    rng = np.random.default_rng(42)
    K = jnp.asarray([550.0, 550.0, 320.0, 240.0])
    all_desc = []
    for scene_id in range(6):
        scene = (synthetic.make_desk if scene_id % 2 else synthetic.make_room)(
            np.random.default_rng(100 + scene_id)
        )
        for v in range(18):
            xi = np.concatenate(
                [rng.uniform(-0.8, 0.8, 2), rng.uniform(-0.3, 0.3, 1),
                 rng.uniform(-0.15, 0.15, 3)]
            ).astype(np.float32)
            Tcw = np.asarray(lie.se3_exp(jnp.asarray(xi)))
            img, _ = synthetic.render(scene, jnp.asarray(Tcw), K, 640, 480)
            feats = orb.extract_orb(img)
            d = np.asarray(feats.desc)[np.asarray(feats.valid)]
            all_desc.append(d)
        print(f"scene {scene_id}: total descriptors {sum(len(d) for d in all_desc)}")

    descs = np.concatenate(all_desc)
    print(f"training on {len(descs)} descriptors...")
    data = vocab.train_vocabulary(descs)
    out = os.path.join(os.path.dirname(__file__), "..", "orb_slam2v2_1_tpu", "data")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "vocab.npz")
    np.savez_compressed(path, **data)
    print(f"saved {path} ({os.path.getsize(path)/1024:.0f} KB)")

    # Sanity: word distribution entropy.
    v = vocab.load_vocabulary(np.load(path))
    words = np.asarray(vocab.assign_words(v, jnp.asarray(
        (np.unpackbits(descs[:5000].view(np.uint8), axis=1, bitorder="little")
         .astype(np.float32) * 2 - 1), jnp.bfloat16)))
    uniq = len(np.unique(words))
    print(f"5000 descriptors -> {uniq} distinct words")


if __name__ == "__main__":
    main()

import numpy as np
import jax
import jax.numpy as jnp

from videotofaces_tpu.parallel import make_mesh, batch_sharding
from videotofaces_tpu.train import ViTClassifier, create_train_state, make_sharded_train_step


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_encoder_forward(rng):
    from videotofaces_tpu.models import vit as V

    mesh = make_mesh()  # 8-way data parallel
    model = V.ViT(img_size=32, patch_size=16, dim=64, depth=2)
    x = rng.normal(0, 1, size=(16, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]

    fn = jax.jit(lambda p, a: model.apply({"params": p}, a),
                 in_shardings=(None, batch_sharding(mesh)),
                 out_shardings=batch_sharding(mesh))
    with mesh:
        sharded = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        out = np.asarray(fn(params, sharded))
    ref = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-5)


def test_data_parallel_detection_postprocess(rng):
    """The fixed-capacity postprocess is embarrassingly parallel over batch."""
    from videotofaces_tpu.models import yolo as Y

    mesh = make_mesh()
    canvas = (96, 128)
    priors, strides = Y.flat_priors_and_strides(canvas)
    maps = [jnp.asarray(rng.normal(-2, 1, size=(8, h, w, 18)).astype(np.float32))
            for (h, w) in [(3, 4), (6, 8), (12, 16)]]
    fn = jax.jit(lambda ms: Y.postprocess(ms, jnp.asarray(priors), jnp.asarray(strides),
                                          pre_topk=256, out_topk=16),
                 in_shardings=([batch_sharding(mesh)] * 3,))
    with mesh:
        sharded = [jax.device_put(m, batch_sharding(mesh)) for m in maps]
        boxes, scores, classes, valid, _of = fn(sharded)
    ref_b, ref_s, _, ref_v, _ = Y.postprocess(maps, jnp.asarray(priors), jnp.asarray(strides),
                                              pre_topk=256, out_topk=16)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_s), rtol=1e-5, atol=1e-6)


def test_sharded_train_step_dp_tp():
    """Full train step over a ('data', 'model') mesh: dp=4 x tp=2."""
    mesh = make_mesh(n_data=4, n_model=2)
    model = ViTClassifier(num_classes=5, img_size=32, patch_size=16, dim=128, depth=2)
    params, opt_state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                               (1, 32, 32, 3), learning_rate=1e-3)
    step, params, opt_state = make_sharded_train_step(mesh, model, tx, params, opt_state)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, size=(8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(8,)).astype(np.int32))
    with mesh:
        losses = []
        for _ in range(3):
            params, opt_state, loss, acc = step(params, opt_state, images, labels)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[2] < losses[0]  # optimizes on a fixed batch


def test_data_parallel_yolo_full_forward(rng):
    """The whole uint8->detections graph shards over the data axis and matches
    the single-device result exactly (postprocess is per-image)."""
    import jax.numpy as jnp
    from videotofaces_tpu.models import yolo as Y
    from videotofaces_tpu.parallel import make_mesh, batch_sharding, replicated

    mesh = make_mesh()
    h, w = 60, 80
    nh, nw = Y.resized_shape(h, w, max_side=96)
    canvas = Y.canvas_shape(nh, nw)
    priors, strides = Y.flat_priors_and_strides(canvas)
    model = Y.YOLOv3(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *canvas, 3)))["params"]
    frames = jnp.asarray(rng.integers(0, 255, size=(8, h, w, 3)).astype(np.uint8))

    def fwd(p, f):
        return Y.full_forward(p, f, (nh, nw), canvas, jnp.asarray(priors),
                              jnp.asarray(strides), out_topk=16)

    ref = jax.jit(fwd)(params, frames)
    sharded_fn = jax.jit(fwd, in_shardings=(replicated(mesh), batch_sharding(mesh)),
                         out_shardings=batch_sharding(mesh))
    with mesh:
        got = sharded_fn(params, jax.device_put(frames, batch_sharding(mesh)))
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))  # valid masks
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-4, atol=1e-3)


def test_sharded_kmeans_matches_single_device(rng):
    """Lloyd iterations sharded over the 8-device mesh give sklearn-identical
    assignments (same as the single-device path)."""
    from videotofaces_tpu.ops.kmeans import kmeans_fit

    x = rng.normal(size=(203, 24)).astype(np.float32)  # deliberately not /8
    x[:70] += 4.0
    x[70:150] -= 4.0
    mesh = make_mesh()
    ref_labels, ref_centers, ref_inertia = kmeans_fit(x, 3, random_state=0)
    got_labels, got_centers, got_inertia = kmeans_fit(x, 3, random_state=0, mesh=mesh)
    np.testing.assert_array_equal(got_labels, ref_labels)
    np.testing.assert_allclose(got_centers, ref_centers, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_inertia, ref_inertia, rtol=1e-4)


def test_sharded_silhouette_matches_single_device(rng):
    from videotofaces_tpu.ops import cluster_scores as CS

    x = rng.normal(size=(157, 16)).astype(np.float32)
    labels = rng.integers(0, 4, size=157)
    mesh = make_mesh()
    ref = CS.silhouette_score(x, labels, 4)
    got = CS.silhouette_score(x, labels, 4, mesh=mesh)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sharded_dedup_cosine_matches_single_device(rng):
    from videotofaces_tpu.ops import distances as D

    x = rng.normal(size=(133, 32)).astype(np.float32)
    x[40] = x[7] * 1.7  # cosine-identical pair
    ref_m, ref_i = D.dedup_cosine(x)
    got_m, got_i = D.dedup_cosine(x, mesh=make_mesh())
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))

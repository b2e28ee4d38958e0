"""Serving Predictor tests."""

import numpy as np

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.predict import Predictor
from ecologysemanticsegmentation_tpu.train import create_train_state, make_optimizer, save_checkpoint


def _mini_predictor(tmp_path, **kw):
    model = build_model("unet", num_classes=2)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3), make_optimizer())
    save_checkpoint(str(tmp_path), "p", 3, state)
    return Predictor.from_checkpoint(
        str(tmp_path / "p_epoch3.ckpt"), num_classes=2, model_name="unet",
        img_size=32, batch_size=4, **kw,
    )


def test_predictor_padding_and_shapes(tmp_path, rng):
    p = _mini_predictor(tmp_path)
    out = p(rng.rand(6, 32, 32, 3).astype(np.float32))  # 6 -> batches of 4+pad
    assert out.shape == (6, 32, 32, 2)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def test_predictor_uint8_resize_single(tmp_path, rng):
    p = _mini_predictor(tmp_path)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)  # single HWC, wrong size
    out = p(img)
    assert out.shape == (1, 32, 32, 2)


def test_predictor_threshold(tmp_path, rng):
    p = _mini_predictor(tmp_path, threshold=0.5)
    out = p(rng.rand(2, 32, 32, 3).astype(np.float32))
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_fold_batchnorm_preserves_eval_forward(rng):
    """BN folding (models/fold_bn.py) must leave the eval-mode forward
    numerically unchanged (f32 model => exact to float rounding), with
    non-trivial batch statistics."""
    from ecologysemanticsegmentation_tpu.models import DeepLabV3Plus, fold_batchnorm

    model = DeepLabV3Plus(num_classes=2, aspp_dropout=0.0, dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    params = variables["params"]
    # randomize the running stats so the fold is non-trivial
    stats = jax.tree_util.tree_map_with_path(
        lambda kp, x: jnp.asarray(
            0.5 + rng.rand(*x.shape) if "var" in str(kp[-1])
            else rng.randn(*x.shape) * 0.3, jnp.float32),
        variables["batch_stats"],
    )
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    ref = model.apply({"params": params, "batch_stats": stats}, x, train=False)

    fp, fs, n = fold_batchnorm(params, stats)
    assert n >= 30, f"expected to fold all conv+BN pairs, folded {n}"
    folded = model.apply({"params": fp, "batch_stats": fs}, x, train=False)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_predictor_fold_bn_matches_unfolded(tmp_path, rng):
    x = rng.rand(4, 32, 32, 3).astype(np.float32)
    folded = _mini_predictor(tmp_path, fold_bn=True)
    plain = _mini_predictor(tmp_path, fold_bn=False)
    assert folded.n_folded_bns > 0
    # bf16 compute: folding changes rounding, not semantics
    np.testing.assert_allclose(folded(x), plain(x), atol=0.02)


def test_predict_files_streams_in_order(tmp_path, rng):
    """iter_files/predict_files: ring-decoded JPEGs + PNG fallback + an
    unreadable path, results matching __call__ on the same decoded pixels."""
    cv2 = __import__("cv2")

    p = _mini_predictor(tmp_path)
    paths = []
    for i in range(6):  # 6 files -> 2 ragged batches of 4
        img = (rng.rand(50, 40, 3) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (5, 5), 2)
        path = str(tmp_path / (f"f{i}.jpg" if i % 2 == 0 else f"f{i}.png"))
        cv2.imwrite(path, img)
        paths.append(path)
    paths.insert(3, str(tmp_path / "missing.jpg"))

    got = list(p.iter_files(paths))
    assert [g[0] for g in got] == paths
    assert got[3][1] is None  # unreadable
    ref_imgs = np.stack([
        cv2.resize(cv2.imread(q), (32, 32))
        for q in paths if "missing" not in q])
    ref = p(ref_imgs)
    k = 0
    for path, probs in got:
        if "missing" in path:
            continue
        assert probs.shape == (32, 32, 2)
        # decode path differs by <=2 LSB in uint8 input; bf16 forward keeps
        # the output within a small probability tolerance
        np.testing.assert_allclose(probs, ref[k], atol=0.05)
        k += 1

    out, ok = p.predict_files(paths)
    assert out.shape == (7, 32, 32, 2)
    np.testing.assert_array_equal(
        ok, [True, True, True, False, True, True, True])
    assert (out[3] == 0).all()


def test_iter_files_misnamed_jpg_falls_back(tmp_path, rng):
    """A PNG saved with a .jpg extension must fall back from the native
    libjpeg ring to the generic decoder instead of scoring as unreadable;
    with_images=True yields the decoded pixels alongside the probs."""
    import cv2

    p = _mini_predictor(tmp_path)
    img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    ok_png, buf = cv2.imencode(".png", img)
    assert ok_png
    misnamed = tmp_path / "actually_a_png.jpg"
    misnamed.write_bytes(buf.tobytes())

    got = list(p.iter_files([str(misnamed)], with_images=True))
    assert len(got) == 1
    path, probs, decoded = got[0]
    assert probs is not None and probs.shape == (32, 32, 2)
    ref = cv2.resize(img, (32, 32))
    assert decoded.shape == (32, 32, 3)
    assert np.abs(decoded.astype(int) - ref.astype(int)).max() <= 2


def test_predict_files_all_unreadable_keeps_channel_count(tmp_path):
    """predict_files must zero-fill with the MODEL's channel count even
    when no file decodes (num_classes plumbs through from_checkpoint)."""
    p = _mini_predictor(tmp_path)
    out, ok = p.predict_files([str(tmp_path / "nope1.jpg"),
                               str(tmp_path / "nope2.png")])
    assert out.shape == (2, 32, 32, 2)
    assert not ok.any() and (out == 0).all()


def test_predictor_mesh_data_parallel(tmp_path, rng):
    """mesh= shards the serving batch over the mesh's data axis; outputs
    match single-device within bf16 recompilation noise, and a
    non-divisible batch_size is rejected up front."""
    import pytest

    from ecologysemanticsegmentation_tpu.parallel import create_mesh

    model = build_model("unet", num_classes=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 32, 3), make_optimizer())
    mesh = create_mesh()  # all 8 virtual devices, pure DP
    x = rng.rand(11, 32, 32, 3).astype(np.float32)

    single = Predictor(model, state, img_size=32, batch_size=8)
    sharded = Predictor(model, state, img_size=32, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(sharded(x), single(x), atol=2e-3)

    unfrozen = Predictor(model, state, img_size=32, batch_size=8, mesh=mesh,
                         freeze_weights=False)
    np.testing.assert_allclose(unfrozen(x), single(x), atol=2e-3)

    with pytest.raises(ValueError, match="not divisible"):
        Predictor(model, state, img_size=32, batch_size=6, mesh=mesh)


def test_predict_cli_writes_masks(tmp_path, rng, monkeypatch):
    """The predict CLI scores files against a checkpoint and writes
    per-organ mask PNGs + optional overlay/npy; unreadable paths skip."""
    import cv2

    from ecologysemanticsegmentation_tpu import predict as predict_cli

    model = build_model("unet", num_classes=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 32, 3), make_optimizer())
    save_checkpoint(str(tmp_path), "p", 3, state)
    img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "a.jpg"), img)
    cv2.imwrite(str(tmp_path / "b.png"), img)

    monkeypatch.setenv("ORGANS", "whole_body,ventral_side")
    monkeypatch.setenv("IMGSIZE", "32")
    out = tmp_path / "preds"
    args = predict_cli.build_argparser().parse_args([
        str(tmp_path / "p_epoch3.ckpt"), str(tmp_path / "a.jpg"),
        str(tmp_path / "b.png"), str(tmp_path / "missing.jpg"),
        "--model", "unet", "--result_dir", str(out),
        "--batch_size", "2", "--npy", "--overlay",
    ])
    predict_cli.main(args)

    for stem in ("a", "b"):
        for organ in ("whole_body", "ventral_side"):
            mask = cv2.imread(str(out / f"{stem}_{organ}.png"),
                              cv2.IMREAD_GRAYSCALE)
            assert mask is not None and mask.shape == (32, 32)
        assert np.load(str(out / f"{stem}_probs.npy")).shape == (32, 32, 2)
        assert cv2.imread(str(out / f"{stem}_overlay.png")).shape == (32, 32, 3)
    assert not (out / "missing_whole_body.png").exists()


def test_export_compiled_round_trip(tmp_path, rng):
    """export_compiled serializes the baked forward as a StableHLO artifact;
    from_exported serves it bit-identically with no model code, recovering
    batch/image size and channel count from the serialized signature."""
    import pytest

    p = _mini_predictor(tmp_path)
    art = tmp_path / "serve.stablehlo"
    p.export_compiled(str(art))
    assert art.stat().st_size > 1000

    q = Predictor.from_exported(str(art))
    assert (q.img_size, q.batch_size, q.num_classes) == (32, 4, 2)
    x = rng.rand(6, 32, 32, 3).astype(np.float32)
    np.testing.assert_array_equal(q(x), p(x))

    # the unfrozen path has no baked program to export
    model = build_model("unet", num_classes=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 32, 3), make_optimizer())
    with pytest.raises(ValueError, match="freeze_weights"):
        Predictor(model, state, img_size=32, batch_size=4,
                  freeze_weights=False).export_compiled(str(art))


def test_export_compiled_int8_after_calibration(tmp_path, rng):
    """A lazily-calibrated int8 Predictor exports once it has served a
    batch (the quantized program exists then); before that it refuses."""
    import pytest

    p = _mini_predictor(tmp_path, int8=True)
    art = tmp_path / "int8.stablehlo"
    with pytest.raises(ValueError, match="int8"):
        p.export_compiled(str(art))
    x = rng.rand(4, 32, 32, 3).astype(np.float32)
    a = p(x)  # triggers calibration + compile
    p.export_compiled(str(art))
    q = Predictor.from_exported(str(art))
    np.testing.assert_array_equal(q(x), a)


def test_predict_cli_export_and_serve_from_artifact(tmp_path, rng, monkeypatch):
    """CLI: --export_compiled writes the artifact (no files needed);
    --from_exported scores files from it without model flags."""
    import cv2

    from ecologysemanticsegmentation_tpu import predict as predict_cli

    model = build_model("unet", num_classes=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 32, 3), make_optimizer())
    save_checkpoint(str(tmp_path), "p", 3, state)
    monkeypatch.setenv("ORGANS", "whole_body,ventral_side")
    monkeypatch.setenv("IMGSIZE", "32")

    art = tmp_path / "serve.stablehlo"
    predict_cli.main(predict_cli.build_argparser().parse_args([
        str(tmp_path / "p_epoch3.ckpt"), "--model", "unet",
        "--batch_size", "2", "--export_compiled", str(art)]))
    assert art.exists()

    cv2.imwrite(str(tmp_path / "a.png"),
                (rng.rand(48, 48, 3) * 255).astype(np.uint8))
    out = tmp_path / "preds"
    predict_cli.main(predict_cli.build_argparser().parse_args([
        str(art), str(tmp_path / "a.png"), "--from_exported",
        "--result_dir", str(out)]))
    mask = cv2.imread(str(out / "a_whole_body.png"), cv2.IMREAD_GRAYSCALE)
    assert mask is not None and mask.shape == (32, 32)


def test_predict_cli_overlay_masks_are_binary(tmp_path, rng, monkeypatch):
    """--overlay must feed {0,255} masks to the visualizer (it binarizes
    channels with `// 255`, so probability heatmaps would render empty)."""
    import cv2

    from ecologysemanticsegmentation_tpu import predict as predict_cli
    from ecologysemanticsegmentation_tpu import utils as utils_mod

    model = build_model("unet", num_classes=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 32, 3), make_optimizer())
    save_checkpoint(str(tmp_path), "p", 3, state)
    cv2.imwrite(str(tmp_path / "a.png"),
                (rng.rand(48, 48, 3) * 255).astype(np.uint8))

    seen = []
    real = utils_mod.display_composite_annotations

    def spy(img, masks, organs, **kw):
        seen.append(np.asarray(masks).copy())
        return real(img, masks, organs, **kw)

    monkeypatch.setattr(utils_mod, "display_composite_annotations", spy)
    monkeypatch.setenv("ORGANS", "whole_body,ventral_side")
    monkeypatch.setenv("IMGSIZE", "32")
    args = predict_cli.build_argparser().parse_args([
        str(tmp_path / "p_epoch3.ckpt"), str(tmp_path / "a.png"),
        "--model", "unet", "--result_dir", str(tmp_path / "preds"),
        "--batch_size", "2", "--overlay",
    ])
    predict_cli.main(args)

    assert len(seen) == 1
    assert set(np.unique(seen[0])).issubset({0, 255})


def test_predict_cli_watch_scores_new_files(tmp_path, rng, monkeypatch):
    """--watch polls a drop directory: a file is scored once its mtime is
    stable across one poll, each version scored once, unreadable skipped."""
    import os

    import cv2

    from ecologysemanticsegmentation_tpu import predict as predict_cli

    model = build_model("unet", num_classes=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 32, 3), make_optimizer())
    save_checkpoint(str(tmp_path), "p", 3, state)
    drop = tmp_path / "drop"
    drop.mkdir()
    img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(drop / "a.png"), img)

    monkeypatch.setenv("ORGANS", "whole_body,ventral_side")
    monkeypatch.setenv("IMGSIZE", "32")
    out = tmp_path / "preds"
    args = predict_cli.build_argparser().parse_args([
        str(tmp_path / "p_epoch3.ckpt"), str(drop), "--model", "unet",
        "--result_dir", str(out), "--batch_size", "2", "--watch",
        "--poll_interval", "0.05", "--watch_rounds", "3",
    ])
    # drop a second file after the first scan via the sleep hook
    import time as time_mod

    real_sleep = time_mod.sleep
    dropped = []

    def sleep_and_drop(s):
        if not dropped:
            cv2.imwrite(str(drop / "b.jpg"), img)
            dropped.append(True)
        real_sleep(min(s, 0.05))

    monkeypatch.setattr(time_mod, "sleep", sleep_and_drop)
    predict_cli.main(args)

    assert (out / "a_whole_body.png").exists()
    assert (out / "b_whole_body.png").exists()
    # each file scored exactly once: mask mtimes stable across later scans
    assert os.path.getmtime(out / "a_whole_body.png") < \
        os.path.getmtime(out / "b_whole_body.png")


def test_predict_cli_review_fixes(tmp_path, monkeypatch):
    """Review regressions: (a) no-files invocations error out BEFORE the
    model load unless export-only; (b) --int8 --export_compiled with files
    exports AFTER scoring (lazy calibration needs a served batch);
    (c) empty placeholder organ names get class<N> filenames."""
    import pytest

    from ecologysemanticsegmentation_tpu import predict as predict_cli

    loaded = []
    calls = []

    class Stub:
        num_classes = 3

        def iter_files(self, files, fast_scale=False, with_images=False):
            calls.append("score")
            probs = np.full((8, 8, 3), 0.75, np.float32)
            for p in files:
                yield (p, probs, np.zeros((8, 8, 3), np.uint8)) \
                    if with_images else (p, probs)

        def export_compiled(self, path):
            calls.append("export")
            with open(path, "wb") as f:
                f.write(b"x")

    monkeypatch.setattr(
        predict_cli.Predictor, "from_checkpoint",
        classmethod(lambda cls, *a, **k: (loaded.append(1), Stub())[1]))

    with pytest.raises(SystemExit, match="no input files"):
        predict_cli.main(predict_cli.build_argparser().parse_args(["ckpt"]))
    with pytest.raises(SystemExit, match="no input files"):
        predict_cli.main(predict_cli.build_argparser().parse_args(
            ["ckpt", "--watch", "--export_compiled", "a"]))
    assert not loaded  # errored before any model load

    monkeypatch.setenv("ORGANS", "whole_body,,")
    monkeypatch.setenv("IMGSIZE", "8")
    out = tmp_path / "preds"
    art = tmp_path / "a.stablehlo"
    (tmp_path / "img.png").write_bytes(b"ignored-by-stub")
    predict_cli.main(predict_cli.build_argparser().parse_args([
        "ckpt", str(tmp_path / "img.png"), "--int8",
        "--export_compiled", str(art), "--result_dir", str(out)]))
    assert calls == ["score", "export"] and art.exists()
    assert (out / "img_whole_body.png").exists()
    assert (out / "img_class1.png").exists()  # empty names don't collide
    assert (out / "img_class2.png").exists()


def test_watch_rescors_file_replaced_mid_scan(tmp_path, monkeypatch):
    """A file replaced while its batch is being scored must be rescored on
    a later scan (seen records the mtime whose content was read)."""
    import os

    from ecologysemanticsegmentation_tpu import predict as predict_cli

    scored = []

    class Stub:
        num_classes = 1

        def iter_files(self, files, fast_scale=False, with_images=False):
            for p in files:
                scored.append(os.path.getmtime(p))
                # writer replaces the file DURING scoring
                if len(scored) == 1:
                    with open(p, "wb") as f:
                        f.write(b"v2")
                    os.utime(p, (1e9, 1e9))
                probs = np.zeros((4, 4, 1), np.float32)
                yield (p, probs, None) if with_images else (p, probs)

    drop = tmp_path / "drop"
    drop.mkdir()
    target = drop / "f.png"
    target.write_bytes(b"v1")

    args = predict_cli.build_argparser().parse_args([
        "ckpt", str(drop), "--watch", "--poll_interval", "0.01",
        "--watch_rounds", "6", "--result_dir", str(tmp_path / "p")])
    monkeypatch.setenv("ORGANS", "whole_body")
    import ecologysemanticsegmentation_tpu.predict as pmod

    (tmp_path / "p").mkdir()
    pmod._watch_loop(Stub(), args.files, args, ["whole_body"])
    assert len(scored) == 2  # v1 scored, then the v2 replacement rescored


def test_resize_pil_fallback_matches_cv2(monkeypatch, rng):
    """Serving must work without OpenCV: the PIL resize fallback is
    numerically identical to cv2.resize (same half-pixel convention)."""
    import builtins

    from ecologysemanticsegmentation_tpu.predict import _resize_bilinear_np

    im = rng.rand(48, 40, 3).astype(np.float32)
    want = _resize_bilinear_np(im, 64)  # cv2 path

    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("cv2 disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    got = _resize_bilinear_np(im, 64)  # PIL path
    np.testing.assert_allclose(got, want, atol=1e-6)

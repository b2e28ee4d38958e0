"""Serving path: a padded-batch, compile-once Predictor.

The reference's only inference surfaces are the eval scripts and the batch-1
video loop.  For production serving this module provides the missing piece:
load a checkpoint once, compile one fixed-shape forward, and serve arbitrary
request sizes by padding to the compiled batch (no per-request recompiles,
no dynamic shapes — the XLA serving contract).

Example::

    from ecologysemanticsegmentation_tpu.predict import Predictor
    p = Predictor.from_checkpoint("models/expt/channels256/img256/expt_epoch90.ckpt",
                                  num_classes=3)
    masks = p(images)               # (N,H,W,3) uint8/float in, (N,H,W,3) probs out
"""

from __future__ import annotations

import numpy as np


def _resize_bilinear_np(im: np.ndarray, size: int) -> np.ndarray:
    """cv2.resize(..., INTER_LINEAR) with a PIL fallback, so the serving
    entry point works in environments without OpenCV (ROADMAP portability
    item; the data loaders still require cv2 — serving does not)."""
    try:
        import cv2

        return cv2.resize(im, (size, size))
    except ImportError:
        from PIL import Image

        arr = np.asarray(im, np.float32)
        chans = [
            np.asarray(Image.fromarray(arr[..., c]).resize(
                (size, size), Image.BILINEAR))
            for c in range(arr.shape[-1])
        ]
        return np.stack(chans, axis=-1)


class Predictor:
    """Compile-once batched inference over a trained checkpoint."""

    def __init__(self, model, state, img_size: int = 256, batch_size: int = 16,
                 union_reverse: bool = False, threshold: float | None = None,
                 fold_bn: bool = True, freeze_weights: bool = True,
                 int8: bool = False, calibration_images=None, mesh=None,
                 num_classes: int | None = None):
        import jax
        import jax.numpy as jnp

        from .losses import return_union_sets_descending_order

        self.img_size = img_size
        self.batch_size = batch_size
        self.threshold = threshold
        # Known output channel count (None = discover from the first
        # successful forward) — lets predict_files shape its zero-fill
        # correctly even when every input file is unreadable.
        self.num_classes = num_classes
        # Data-parallel serving: shard the batch over the mesh's leading
        # axis (weights replicated — they're jit constants in the baked
        # path, so XLA broadcasts them once at load).  Multi-chip TPU
        # serving without a serving framework: the padded-batch contract
        # already guarantees the fixed, divisible global batch.
        jit_shard_kw = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_data = mesh.shape[mesh.axis_names[0]]
            if batch_size % n_data != 0:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh's "
                    f"{mesh.axis_names[0]} axis ({n_data})")
            shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            jit_shard_kw = {"in_shardings": shard, "out_shardings": shard}
        self._mesh = mesh
        if fold_bn:
            # Inference-only: pre-multiply BN scale/stats into the conv
            # kernels (models/fold_bn.py) — the per-channel BN multiply
            # vanishes from the compiled forward.  Training states are
            # unaffected (the Predictor owns this state copy).
            from .models.fold_bn import fold_batchnorm

            p, bs, self.n_folded_bns = fold_batchnorm(
                state.params, state.batch_stats)
            state = state.replace(params=p, batch_stats=bs)
        self._state = state

        def postprocess(out):
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            if union_reverse:
                probs = return_union_sets_descending_order(probs, reverse=True)
            return probs

        def apply(variables, images):
            return postprocess(
                model.apply(variables, images.astype(jnp.bfloat16), train=False))

        if int8:
            # Post-training int8 quantization (quant.py): per-channel int8
            # weights x per-tensor int8 activations on the MXU's double-rate
            # int8 path, calibrated on ``calibration_images`` (or lazily on
            # the first served batch).  Implies freeze_weights — the int8
            # kernels and scales are baked as program constants.
            self.n_quantized = None
            self._calib = calibration_images

            def forward(_state, images):
                if getattr(self, "_int8_fn", None) is None:
                    from .quant import quantize_for_serving

                    variables = {"params": self._state.params,
                                 "batch_stats": self._state.batch_stats}
                    calib = self._calib if self._calib is not None else [images]
                    calib = [jnp.asarray(b, jnp.bfloat16) for b in
                             (calib if isinstance(calib, (list, tuple)) else [calib])]
                    qfn, self.n_quantized = quantize_for_serving(
                        model, variables, calib)
                    self._int8_fn = jax.jit(
                        lambda im: postprocess(qfn(im.astype(jnp.bfloat16))),
                        **jit_shard_kw)
                    self._calib = None
                return self._int8_fn(images)

            self._forward = forward
        elif freeze_weights:
            # Serving mode: bake the (folded) weights into the compiled
            # program as constants — XLA pre-layouts/constant-folds them.
            # Measured v5e batch 128 @ 256px: 16.8 -> 15.9 ms/step
            # (experiments/serving_fold_ab.py).  Value-only BN folding is
            # timing-neutral (the eval-BN affine was already fused into the
            # conv epilogue); the win comes from constant-baking.
            variables = {"params": self._state.params,
                         "batch_stats": self._state.batch_stats}
            baked = jax.jit(lambda images: apply(variables, images),
                            **jit_shard_kw)
            self._baked = baked
            self._forward = lambda _state, images: baked(images)
        else:
            if jit_shard_kw:
                from jax.sharding import NamedSharding, PartitionSpec

                # replicate the state tree (prefix pytree spec), shard images
                jit_shard_kw["in_shardings"] = (
                    NamedSharding(mesh, PartitionSpec()),
                    jit_shard_kw["in_shardings"])
            self._forward = jax.jit(
                lambda state, images: apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, images),
                **jit_shard_kw)

    @classmethod
    def from_checkpoint(
        cls, checkpoint_path: str, num_classes: int, model_name: str = "deeplabv3plus",
        encoder_name: str = "resnet34", img_size: int = 256, batch_size: int = 16,
        depthwise: bool = False, **kw,
    ) -> "Predictor":
        import jax

        from .models import build_model
        from .train import create_train_state, load_checkpoint_file, make_optimizer

        model = build_model(
            model_name, num_classes=num_classes, encoder_name=encoder_name,
            depthwise=depthwise,
        )
        template = create_train_state(
            model, jax.random.PRNGKey(0), (1, img_size, img_size, 3), make_optimizer()
        )
        state = load_checkpoint_file(checkpoint_path, template)
        if state is None:
            raise ValueError(f"failed to load checkpoint: {checkpoint_path}")
        return cls(model, state, img_size=img_size, batch_size=batch_size,
                   num_classes=num_classes, **kw)

    def export_compiled(self, path: str, platforms=None) -> None:
        """Serialize the serving forward as a portable StableHLO artifact
        (``jax.export``).  The folded weights travel inside the program as
        constants, so :meth:`from_exported` serves it with NO model code,
        checkpoint, or flax at load time — the TPU-native analog of a
        TorchScript serving export.  Requires the baked path
        (``freeze_weights=True``, the default) or a calibrated int8
        Predictor; by default the artifact is lowered for the platform it
        was built on — pass ``platforms=["cpu", "tpu"]`` for a portable
        artifact that loads on either.
        """
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        if self._mesh is not None:
            raise ValueError(
                "export_compiled supports single-device Predictors; "
                "pass mesh= at load time on the serving host instead")
        fn = getattr(self, "_baked", None) or getattr(self, "_int8_fn", None)
        if fn is None:
            raise ValueError(
                "export_compiled needs the baked forward: construct with "
                "freeze_weights=True (default), or serve one batch first "
                "for the lazily-calibrated int8 path")
        spec = jax.ShapeDtypeStruct(
            (self.batch_size, self.img_size, self.img_size, 3), jnp.float32)
        kw = {"platforms": tuple(platforms)} if platforms else {}
        exported = jexport.export(fn, **kw)(spec)
        with open(path, "wb") as f:
            f.write(exported.serialize())

    @classmethod
    def from_exported(cls, path: str,
                      threshold: float | None = None) -> "Predictor":
        """Serve from an :meth:`export_compiled` artifact — no model code,
        flax modules, or checkpoint needed; batch/image size and channel
        count come from the serialized signature."""
        import jax
        from jax import export as jexport

        with open(path, "rb") as f:
            exported = jexport.deserialize(bytearray(f.read()))
        (b, s, _, _) = exported.in_avals[0].shape
        self = cls.__new__(cls)
        self.img_size = int(s)
        self.batch_size = int(b)
        self.threshold = threshold
        self.num_classes = int(exported.out_avals[0].shape[-1])
        self._mesh = None
        self._state = None
        call = jax.jit(exported.call)
        self._baked = call
        self._forward = lambda _state, images: call(images)
        return self

    def _prepare(self, images: np.ndarray) -> np.ndarray:
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        if images.shape[1:3] != (self.img_size, self.img_size):
            images = np.stack(
                [_resize_bilinear_np(im, self.img_size) for im in images])
        return images.astype(np.float32)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """(N,H,W,3) images (uint8 or [0,1] float; any spatial size) ->
        (N, img_size, img_size, C) probabilities (or binary with threshold)."""
        images = self._prepare(images)
        n = images.shape[0]
        outs = []
        for start in range(0, n, self.batch_size):
            chunk = images[start : start + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            probs = np.asarray(self._forward(self._state, chunk))
            outs.append(probs[: self.batch_size - pad if pad else self.batch_size])
        result = np.concatenate(outs)[:n]
        if self.threshold is not None:
            result = (result > self.threshold).astype(np.float32)
        return result

    def iter_files(self, paths, fast_scale: bool = False,
                   with_images: bool = False):
        """Stream image FILES through the compiled forward; yields
        ``(path, probs_or_None)`` in input order (None = unreadable file).
        With ``with_images=True`` yields ``(path, probs, img)`` where
        ``img`` is the decoded (size, size, 3) BGR uint8 pixels (None for
        unreadable files) — consumers that also need the pixels (overlays)
        avoid a second decode.

        The bulk-scoring serving surface (the reference's closest analog is
        the batch-1 ``test_video.py`` frame loop): JPEG decode runs on the
        native decode ring (``data.native.DecodeRing`` — C worker threads,
        fused decode+resize, no GIL) while the chip executes the previous
        batch, and device dispatch is double-buffered so decode, H2D and
        compute overlap.  Non-JPEG files (or hosts without the native lib)
        decode inline through ``data.imops``.

        ``fast_scale=True`` additionally enables libjpeg's DCT-domain
        prescale — a perf mode whose pixels differ from the exact decode
        (documented in native/hostops.cpp); default keeps the ±2 LSB class.
        """
        from .data import imops, native

        paths = list(paths)
        size = self.img_size
        ring = None
        ring_exts = native.ring_extensions()  # .jpg/.jpeg (+.png w/ libpng)
        if ring_exts and any(p.lower().endswith(ring_exts) for p in paths):
            ring = native.DecodeRing(
                (size, size), capacity=2 * self.batch_size, n_threads=3,
                fast_scale_to=size if fast_scale else 0)
        try:
            seq_for = [
                ring.submit(p)
                if ring is not None and p.lower().endswith(ring_exts)
                else None
                for p in paths
            ]

            def decode(i: int):
                if seq_for[i] is not None:
                    img = ring.get(seq_for[i])
                    if img is not None:
                        return img
                    # libjpeg couldn't decode (e.g. a PNG misnamed .jpg,
                    # CMYK JPEG): fall back to the generic decoder before
                    # declaring the file unreadable, like the loaders do.
                img = imops.imread_bgr(paths[i])
                return None if img is None else imops.resize_linear(
                    img, (size, size))

            def finish(pending):
                chunk_paths, oks, probs, imgs = pending
                probs = np.asarray(probs)  # forces device sync for THIS batch
                if self.threshold is not None:
                    probs = (probs > self.threshold).astype(np.float32)
                for j, p in enumerate(chunk_paths):
                    row = probs[j] if oks[j] else None
                    if with_images:
                        yield p, row, imgs[j] if oks[j] else None
                    else:
                        yield p, row

            pending = None
            for start in range(0, len(paths), self.batch_size):
                idxs = range(start, min(start + self.batch_size, len(paths)))
                imgs, oks, chunk_paths = [], [], []
                for i in idxs:
                    im = decode(i)
                    oks.append(im is not None)
                    imgs.append(
                        im if im is not None
                        else np.zeros((size, size, 3), np.uint8))
                    chunk_paths.append(paths[i])
                chunk = np.stack(imgs).astype(np.float32) / 255.0
                pad = self.batch_size - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
                # dispatch (async under jit) BEFORE syncing the previous
                # batch: decode+H2D of batch k+1 overlaps compute of batch k
                probs = self._forward(self._state, chunk)
                if pending is not None:
                    yield from finish(pending)
                pending = (chunk_paths, oks, probs,
                           imgs if with_images else None)
            if pending is not None:
                yield from finish(pending)
        finally:
            if ring is not None:
                ring.close()

    def predict_files(self, paths, fast_scale: bool = False):
        """Bulk-score files: returns ``(probs (N,S,S,C), ok (N,) bool)``;
        rows with ``ok=False`` (unreadable files) are zero-filled.  Streams
        via :meth:`iter_files`, so peak memory is the output array."""
        paths = list(paths)
        n_classes = self.num_classes
        rows, oks = [], []
        for _, probs in self.iter_files(paths, fast_scale=fast_scale):
            if probs is not None and n_classes is None:
                n_classes = probs.shape[-1]
            rows.append(probs)
            oks.append(probs is not None)
        if n_classes is None:
            n_classes = 1
        blank = np.zeros((self.img_size, self.img_size, n_classes), np.float32)
        out = np.stack([r if r is not None else blank for r in rows]) \
            if rows else np.zeros((0,) + blank.shape, np.float32)
        return out, np.asarray(oks, bool)


def build_argparser():
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m ecologysemanticsegmentation_tpu.predict",
        description="Bulk-score image files with a trained checkpoint: "
        "streams files through the compiled forward (native JPEG decode "
        "ring + double-buffered dispatch) and writes per-organ masks.")
    ap.add_argument("model_path",
                    help="checkpoint file to load (or an exported serving "
                    "artifact with --from_exported)")
    ap.add_argument("files", nargs="*", help="image files to score")
    ap.add_argument("--result_dir", default="predictions")
    ap.add_argument("--model", default="deeplabv3plus")
    ap.add_argument("--encoder", default="resnet34")
    ap.add_argument("--depthwiseconv", action="store_true")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=None,
                    help="binarize probabilities at this value")
    ap.add_argument("--int8", action="store_true",
                    help="serve with post-training int8 quantization")
    ap.add_argument("--union_reverse", action="store_true",
                    help="undo the union-set label transform (sequential models)")
    ap.add_argument("--fast_scale", action="store_true",
                    help="libjpeg DCT-domain prescale (faster, ±few-LSB pixels)")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard each serving batch over ALL local devices "
                    "(batch_size must divide evenly)")
    ap.add_argument("--overlay", action="store_true",
                    help="also write an organ-colored overlay per image")
    ap.add_argument("--npy", action="store_true",
                    help="also write raw (S,S,C) probabilities as .npy")
    ap.add_argument("--export_compiled", default=None, metavar="PATH",
                    help="serialize the compiled serving forward (weights "
                    "baked as constants) to PATH; scoring continues if "
                    "files were given")
    ap.add_argument("--from_exported", action="store_true",
                    help="model_path is an --export_compiled artifact "
                    "(no model code or checkpoint needed)")
    ap.add_argument("--watch", action="store_true",
                    help="treat the given paths as directories/files to "
                    "POLL: score new images as they appear (Ctrl-C stops)")
    ap.add_argument("--poll_interval", type=float, default=2.0,
                    help="seconds between --watch directory scans")
    ap.add_argument("--watch_rounds", type=int, default=0,
                    help="stop --watch after N scans (0 = run forever)")
    ap.add_argument("--platform", default=None)
    return ap


_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff")


def _score_files(predictor, files, args, organs):
    """Score ``files`` through the streaming path and write the per-organ
    mask PNGs (+ optional overlay/npy) to ``args.result_dir``; returns the
    number successfully scored."""
    import os

    from .data import imops

    n_ok = 0
    for path, probs, img in predictor.iter_files(
            files, fast_scale=args.fast_scale, with_images=True):
        stem = os.path.splitext(os.path.basename(path))[0]
        if probs is None:
            print(f"{path}: unreadable, skipped")
            continue
        n_ok += 1
        mask8 = np.clip(probs * 255.0, 0, 255).astype(np.uint8)
        for c in range(probs.shape[-1]):
            # empty placeholder organ names (ORGANS=whole_body,,) would
            # collide on "{stem}_.png" — fall through to class<N>
            name = (organs[c] if c < len(organs) and organs[c]
                    else f"class{c}")
            imops.imwrite_bgr(
                os.path.join(args.result_dir, f"{stem}_{name}.png"),
                mask8[..., c])
        if args.npy:
            np.save(os.path.join(args.result_dir, f"{stem}_probs.npy"), probs)
        if args.overlay:
            from .utils import display_composite_annotations

            # the visualizer binarizes channels with `// 255`, so feed it
            # {0,255} masks (probability heatmaps would render near-empty)
            thr = args.threshold if args.threshold is not None else 0.5
            bin8 = ((probs >= thr) * np.uint8(255)).astype(np.uint8)
            entries = display_composite_annotations(
                img[..., ::-1], bin8, organs, verbose=False)
            over = entries[-1][next(iter(entries[-1]))]
            imops.imwrite_bgr(
                os.path.join(args.result_dir, f"{stem}_overlay.png"),
                over[..., ::-1])
        cover = " ".join(
            f"{organs[c] if c < len(organs) and organs[c] else f'class{c}'}"
            f"={probs[..., c].mean():.3f}"
            for c in range(probs.shape[-1]))
        print(f"{path}: {cover}")
    return n_ok


def _watch_loop(predictor, roots, args, organs):
    """Poll ``roots`` (directories or files) and score images as they
    appear — continuous serving over a drop directory.  A file is picked
    up once its mtime has been stable for one poll (writers still copying
    are retried next scan); already-scored paths are remembered."""
    import os
    import time

    seen: dict[str, float] = {}   # path -> mtime at scoring time
    pending: dict[str, float] = {}  # path -> last observed mtime
    rounds = 0
    print(f"watching {roots} every {args.poll_interval}s "
          f"({'forever' if not args.watch_rounds else f'{args.watch_rounds} scans'})")
    while True:
        candidates = []
        for root in roots:
            if os.path.isdir(root):
                for name in sorted(os.listdir(root)):
                    if name.lower().endswith(_IMAGE_EXTS):
                        candidates.append(os.path.join(root, name))
            elif os.path.exists(root):
                candidates.append(root)
        ready = []  # (path, mtime-that-passed-the-stability-check)
        for p in candidates:
            try:
                mtime = os.path.getmtime(p)
            except OSError:
                continue
            if seen.get(p) == mtime:
                continue  # already scored this version
            if pending.get(p) == mtime:
                ready.append((p, mtime))  # stable across one poll
                del pending[p]
            else:
                pending[p] = mtime  # new or still being written
        if ready:
            # One streaming pass per scan (a fresh decode ring per round —
            # 3 thread spawns, negligible next to the per-batch compute).
            n = _score_files(predictor, [p for p, _ in ready], args, organs)
            # Record the mtime whose CONTENT was scored: a file replaced
            # mid-scan keeps its new mtime unseen and is rescored next
            # round instead of being silently skipped.
            seen.update(ready)
            print(f"scan: scored {n}/{len(ready)} new files "
                  f"-> {args.result_dir}")
        rounds += 1
        if args.watch_rounds and rounds >= args.watch_rounds:
            return
        time.sleep(args.poll_interval)


def main(args=None):
    """CLI: the serving-path analog of the eval scripts' PNG dumps
    (reference ``test_multiclass.py:94-102`` writes overlays from inside the
    eval sweep; this scores arbitrary files against one checkpoint)."""
    import os

    args = args if args is not None else build_argparser().parse_args()
    # Validate BEFORE the (minutes-long on remote TPU) model load/compile:
    # with no inputs, only an export-only invocation makes sense.
    if not args.files and not (args.export_compiled and not args.watch):
        raise SystemExit(
            "predict: no input files given — pass image paths (or drop "
            "directories with --watch), or --export_compiled alone to "
            "only export")
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from .config import EnvConfig

    cfg = EnvConfig.from_env()
    organs = list(cfg.organs)
    if args.from_exported:
        if args.data_parallel:
            print("--data_parallel is ignored with --from_exported "
                  "(the artifact was traced single-device; serve the "
                  "checkpoint with --data_parallel for sharded batches)")
        predictor = Predictor.from_exported(
            args.model_path, threshold=args.threshold)
    else:
        mesh = None
        if args.data_parallel:
            import jax

            from .parallel import create_mesh

            if jax.device_count() > 1:
                mesh = create_mesh()
        predictor = Predictor.from_checkpoint(
            args.model_path, num_classes=cfg.num_classes, model_name=args.model,
            encoder_name=args.encoder, depthwise=args.depthwiseconv,
            img_size=cfg.img_size, batch_size=args.batch_size,
            threshold=args.threshold, int8=args.int8,
            union_reverse=args.union_reverse, mesh=mesh)
    def _export():
        predictor.export_compiled(args.export_compiled)
        print(f"exported compiled serving artifact -> {args.export_compiled}")

    if not args.files:
        _export()  # export-only invocation (validated above)
        return
    # For --int8 the quantized program only exists after a served batch
    # (lazy calibration), so when there are files to score, export AFTER
    # scoring; --watch never returns, so export (non-int8) up front there.
    if args.export_compiled and (args.watch or not args.int8):
        _export()
    os.makedirs(args.result_dir, exist_ok=True)

    if args.watch:
        _watch_loop(predictor, args.files, args, organs)
        return
    n_ok = _score_files(predictor, args.files, args, organs)
    print(f"scored {n_ok}/{len(args.files)} files -> {args.result_dir}")
    if args.export_compiled and args.int8:
        _export()


if __name__ == "__main__":
    main()

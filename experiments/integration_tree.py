"""Materialize a realistic multi-source ``./data`` tree (VERDICT r3 #5).

Builds the on-disk layout the packaged registry (fish_metadata.json)
actually points at — the reference's real ``./data`` scan surface
(reference ``dataset/fish/__init__.py:25-41``) — with a few hundred images
across all four loader formats, deliberately dirty files mixed in, ragged
organ sets, size variation, and one TIFF-preview ``.arw``:

* ``Cichlid Picture Collection REVISED (UPDATED)/Annotated Photos/`` —
  COCO-txt polygons (alvaradolab): 60 jpgs at 200-400px, one corrupt jpg,
  one truncated txt, one zero-area-polygon txt, one organ-subset txt.
* ``Machine learning training set/<batch>/`` — 3 batch folders x 20
  images with per-organ mask dirs: one sample missing an organ mask, one
  unreadable original, one all-masks-unreadable, one ``.arw`` original
  (embedded-JPEG-preview TIFF).
* ``SUIM/SUIM/train_val/{images,masks}`` — 40 pairs: one maskless stem,
  one corrupt mask.
* ``Deep Fish/`` + ``json/`` — 40 jpgs + labels json: one corrupt json,
  one with only <=5-point polygons.

Every dirty file must be skipped at INDEX-BUILD time (the loaders'
dirtiness contract) — the train/eval cycle over this tree must never see
an exception from decode.

Run (builds under WORKDIR, default /tmp/integration_run):
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/integration_tree.py
Then from WORKDIR the CLI cycle runs on the registry path (no --dataset
synthetic):
  cd $WORKDIR && ORGANS=whole_body,ventral_side,dorsal_side IMGSIZE=256 \
      python -m ecologysemanticsegmentation_tpu.train_multiclass \
      --batch_size 16 --num_epochs 3
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ecologysemanticsegmentation_tpu.data import imops
from ecologysemanticsegmentation_tpu.data.synthetic import _draw_fish, _shoelace_area

ORGANS = ("whole_body", "ventral_side", "dorsal_side")


def _fish(rng: np.random.RandomState, size: int):
    img, mask = _draw_fish(rng, size, len(ORGANS))  # f32 [0,1] RGB
    bgr = np.ascontiguousarray((img[..., ::-1] * 255).astype(np.uint8))
    return bgr, mask


def _write_arw(path: str, bgr: np.ndarray) -> None:
    """TIFF container with the classic JPEGInterchangeFormat preview pair —
    the structure every camera ``.arw`` carries (tests/test_data.py)."""
    tmp = path + ".preview.jpg"
    assert imops.imwrite_bgr(tmp, bgr)
    with open(tmp, "rb") as f:
        jpg = f.read()
    os.remove(tmp)
    jpeg_off = 8 + 2 + 24 + 4
    buf = struct.pack("<2sHI", b"II", 42, 8)
    buf += struct.pack("<H", 2)
    buf += struct.pack("<HHII", 0x0201, 4, 1, jpeg_off)
    buf += struct.pack("<HHII", 0x0202, 4, 1, len(jpg))
    buf += struct.pack("<I", 0)
    with open(path, "wb") as f:
        f.write(buf + jpg)


def _coco_txt_lines(mask: np.ndarray, size: int, organs=ORGANS) -> list[str]:
    polys = []
    for oi, organ in enumerate(organs):
        m8 = (mask[..., oi] * 255).astype(np.uint8)
        cnt = imops.largest_contour(m8)
        if cnt is None:
            continue
        area = _shoelace_area(cnt)
        if area < 4:
            continue
        flat = " ".join(str(int(v)) for v in cnt.reshape(-1))
        polys.append((organ.replace("_", " "), area, flat))
    lines = [str(len(polys)), "", f"{size} {size}", ""]
    for organ, area, flat in polys:
        lines += [organ, str(area), flat, ""]
    return lines


def build_tree(root: str, seed: int = 4, n_coco: int = 60, n_mlts_batches: int = 3,
               n_mlts_per_batch: int = 20, n_suim: int = 40, n_df: int = 40) -> dict:
    """Build ``<root>/data`` and return a summary of what was written.

    Counts are parameterized so experiments/index_scale.py can materialize
    the reference's documented OOM point (~2,534 images,
    fish_coco_annotator.py:166-172) from the same generators."""
    data = os.path.join(root, "data")
    rng = np.random.RandomState(seed)
    counts = {}

    # --- alvaradolab (COCO txt)
    coco = os.path.join(data, "Cichlid Picture Collection REVISED (UPDATED)",
                        "Annotated Photos")
    os.makedirs(coco, exist_ok=True)
    for i in range(n_coco):
        size = int(rng.randint(200, 401))
        bgr, mask = _fish(rng, size)
        img_path = os.path.join(coco, f"cichlid_{i:03d}.jpg")
        txt_path = img_path[:-4] + ".txt"
        if i == 7:  # corrupt jpg -> index skip
            with open(img_path, "wb") as f:
                f.write(b"\xff\xd8junk")
            with open(txt_path, "w") as f:
                f.write("\n".join(_coco_txt_lines(mask, size)))
            continue
        imops.imwrite_bgr(img_path, bgr)
        if i == 13:  # truncated txt -> parse failure -> index skip
            with open(txt_path, "w") as f:
                f.write("3\n\n256 256\n\nwhole body\n417.5\n")
        elif i == 21:  # zero-area polygon record -> dropped record
            lines = _coco_txt_lines(mask, size)
            lines[4 + 1] = "0"  # first record's area
            with open(txt_path, "w") as f:
                f.write("\n".join(lines))
        elif i % 9 == 5:  # ragged organ set: whole_body only
            with open(txt_path, "w") as f:
                f.write("\n".join(_coco_txt_lines(mask, size,
                                                  organs=("whole_body",))))
        else:
            with open(txt_path, "w") as f:
                f.write("\n".join(_coco_txt_lines(mask, size)))
    counts["alvaradolab"] = n_coco

    # --- ml_training_set (organ folders)
    mlts_root = os.path.join(data, "Machine learning training set")
    n = 0
    for b in range(n_mlts_batches):
        batch = os.path.join(mlts_root, f"Batch {b + 1}")
        os.makedirs(os.path.join(batch, "original image"), exist_ok=True)
        for organ in ORGANS:
            os.makedirs(os.path.join(batch, organ.replace("_", " ")),
                        exist_ok=True)
        for i in range(n_mlts_per_batch):
            size = int(rng.randint(220, 380))
            bgr, mask = _fish(rng, size)
            stem = f"b{b}_fish_{i:02d}"
            orig = os.path.join(batch, "original image", f"{stem}.png")
            if b == 0 and i == 3:  # unreadable original -> index skip
                with open(orig, "wb") as f:
                    f.write(b"\x89PNGjunk")
            elif b == 1 and i == 4:  # .arw original (TIFF preview decode)
                _write_arw(os.path.join(batch, "original image",
                                        f"{stem}.arw"), bgr)
            else:
                imops.imwrite_bgr(orig, bgr)
            for oi, organ in enumerate(ORGANS):
                if b == 2 and i == 5 and organ != "whole_body":
                    continue  # ragged: missing organ masks -> -1 channels
                m8 = (mask[..., oi] * 255).astype(np.uint8)
                seg_path = os.path.join(batch, organ.replace("_", " "),
                                        f"{stem}.png")
                if b == 0 and i == 9:  # all masks unreadable -> index skip
                    with open(seg_path, "wb") as f:
                        f.write(b"nope")
                else:
                    imops.imwrite_bgr(seg_path, imops.invert_u8(m8))
            n += 1
    counts["ml_training_set"] = n

    # --- SUIM
    suim_img = os.path.join(data, "SUIM", "SUIM", "train_val", "images")
    suim_msk = os.path.join(data, "SUIM", "SUIM", "train_val", "masks")
    os.makedirs(suim_img, exist_ok=True)
    os.makedirs(suim_msk, exist_ok=True)
    for i in range(n_suim):
        size = int(rng.randint(200, 401))
        bgr, mask = _fish(rng, size)
        imops.imwrite_bgr(os.path.join(suim_img, f"suim_{i:03d}.jpg"), bgr)
        if i == 11:
            continue  # maskless stem -> index skip
        m8 = (mask[..., 0] * 255).astype(np.uint8)
        suim = np.zeros((size, size, 3), np.uint8)
        suim[m8 > 0] = (0, 255, 255)  # BGR yellow
        mpath = os.path.join(suim_msk, f"suim_{i:03d}.bmp")
        if i == 17:  # corrupt mask -> index skip
            with open(mpath, "wb") as f:
                f.write(b"BMjunk")
        else:
            imops.imwrite_bgr(mpath, suim)
    counts["suim"] = n_suim

    # --- Deep Fish
    df = os.path.join(data, "Deep Fish")
    df_json = os.path.join(df, "json")
    os.makedirs(df_json, exist_ok=True)
    for i in range(n_df):
        size = int(rng.randint(200, 401))
        bgr, mask = _fish(rng, size)
        imops.imwrite_bgr(os.path.join(df, f"df_{i:03d}.jpg"), bgr)
        jpath = os.path.join(df_json, f"df_{i:03d}__labels.json")
        if i == 6:  # corrupt json -> index skip
            with open(jpath, "w") as f:
                f.write("{broken")
            continue
        cnt = imops.largest_contour((mask[..., 0] * 255).astype(np.uint8))
        if i == 23 or cnt is None or len(cnt) <= 5:
            regions = [[{"x": 1, "y": 1}, {"x": 2, "y": 2}]]  # <=5 pts: dropped
        else:
            regions = [[{"x": int(x), "y": int(y)} for x, y in cnt]]
        with open(jpath, "w") as f:
            json.dump({"labels": [{"regions": regions}]}, f)
    counts["deepfish_segclsloc"] = n_df

    return counts


if __name__ == "__main__":
    workdir = os.environ.get("WORKDIR", "/tmp/integration_run")
    os.makedirs(workdir, exist_ok=True)
    counts = build_tree(workdir)
    total = sum(counts.values())
    print(json.dumps({"workdir": workdir, "written": counts, "total": total}))

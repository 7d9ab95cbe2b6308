"""Host-side image transforms, PIL + numpy only (no torch/torchvision).

The reference builds its pipelines from torchvision transforms
(reference: image_model/train_JPDVT.py:289-294, datasets.py:49-63,171-189);
on TPU the host pipeline just has to produce fixed-shape float arrays — all
device-side work (scramble, masking, patchify) lives in ops/jigsaw.py.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance

# The reference disables PIL's decompression-bomb guard for huge textile
# scans (datasets.py:16).
Image.MAX_IMAGE_PIXELS = None


def center_crop_arr(pil_image: Image.Image, image_size: int) -> Image.Image:
    """ADM center crop: iterative BOX halving then BICUBIC resize then crop.

    Port of the reference's copy (train_JPDVT.py:79-97, inference.py:95-111,
    itself from openai/guided-diffusion).
    """
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC)
    arr = np.array(pil_image)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return Image.fromarray(arr[cy:cy + image_size, cx:cx + image_size])


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(int) semantics: shorter side -> size, BILINEAR."""
    w, h = img.size
    if w <= h:
        return img.resize((size, max(1, round(h * size / w))), Image.BILINEAR)
    return img.resize((max(1, round(w * size / h)), size), Image.BILINEAR)


def safe_resize(img: Image.Image, max_size: int = 2048) -> Image.Image:
    """Thumbnail very large scans first (datasets.py:161-167)."""
    if max(img.size) > max_size:
        img = img.copy()
        img.thumbnail((max_size, max_size), Image.LANCZOS)
    return img


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def random_crop(img: Image.Image, size: int, rng: np.random.Generator) -> Image.Image:
    w, h = img.size
    left = int(rng.integers(0, w - size + 1))
    top = int(rng.integers(0, h - size + 1))
    return img.crop((left, top, left + size, top + size))


def color_jitter(img: Image.Image, rng: np.random.Generator, *,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4, hue: float = 0.1) -> Image.Image:
    """torchvision-style jitter: uniform factor in [1-x, 1+x], random order;
    hue shift in [-h, h] via HSV roll."""
    ops = []
    if brightness:
        ops.append(("b", float(rng.uniform(1 - brightness, 1 + brightness))))
    if contrast:
        ops.append(("c", float(rng.uniform(1 - contrast, 1 + contrast))))
    if saturation:
        ops.append(("s", float(rng.uniform(1 - saturation, 1 + saturation))))
    if hue:
        ops.append(("h", float(rng.uniform(-hue, hue))))
    rng.shuffle(ops)
    for kind, f in ops:
        if kind == "b":
            img = ImageEnhance.Brightness(img).enhance(f)
        elif kind == "c":
            img = ImageEnhance.Contrast(img).enhance(f)
        elif kind == "s":
            img = ImageEnhance.Color(img).enhance(f)
        else:
            hsv = np.array(img.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(f * 255)) % 256
            img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    return img


def to_array(img: Image.Image) -> np.ndarray:
    """uint8 RGB -> float32 [0, 1], HWC."""
    return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0


def normalize(x: np.ndarray) -> np.ndarray:
    """[0, 1] -> [-1, 1] (the reference's Normalize(0.5, 0.5))."""
    return x * 2.0 - 1.0


def denormalize(x: np.ndarray) -> np.ndarray:
    return np.clip(x * 0.5 + 0.5, 0.0, 1.0)

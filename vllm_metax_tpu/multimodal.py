"""Multimodal input processing shared by the offline LLM API and the
OpenAI server (the reference inherits vLLM's multimodal registry +
HF-processor path for its Qwen-VL forks, vllm_metax/models/qwen2_vl.py).

Raw images (PIL / numpy HWC) are preprocessed with the checkpoint's own
HF image processor (preprocessor_config.json) when available, falling
back to a Qwen2VLImageProcessor parameterized from the vision config —
the exact smart-resize/normalize/patchify pipeline the HF reference model
sees, so token parity carries over to real image inputs.
"""

from __future__ import annotations

import base64
import io
from typing import Any, Optional

import numpy as np

from vllm_metax_tpu.config import ModelConfig
from vllm_metax_tpu.logger import init_logger

logger = init_logger(__name__)

_PROCESSOR_CACHE: dict[str, Any] = {}


def _get_image_processor(cfg: ModelConfig):
    key = cfg.model or cfg.architecture
    if key in _PROCESSOR_CACHE:
        return _PROCESSOR_CACHE[key]
    proc = None
    if cfg.model:
        try:
            from transformers import AutoImageProcessor

            proc = AutoImageProcessor.from_pretrained(cfg.model)
        except Exception:
            proc = None
    if proc is None:
        # synthesize from the vision config (tiny/dummy checkpoints)
        from transformers import Qwen2VLImageProcessor

        vc = cfg.hf_config.get("vision_config") or {}
        ps = int(vc.get("patch_size", 14))
        merge = int(vc.get("spatial_merge_size", 2))
        proc = Qwen2VLImageProcessor(
            patch_size=ps,
            merge_size=merge,
            temporal_patch_size=int(vc.get("temporal_patch_size", 2)),
        )
    _PROCESSOR_CACHE[key] = proc
    return proc


def _is_raw_image(x) -> bool:
    if isinstance(x, np.ndarray) and x.ndim == 3:
        return True
    try:
        from PIL import Image

        return isinstance(x, Image.Image)
    except ImportError:
        return False


def image_from_url(url: str):
    """Decode an OpenAI image_url payload. Only data: URIs are supported
    (the serving host has no network egress)."""
    from PIL import Image

    if url.startswith("data:"):
        _, _, payload = url.partition(",")
        return Image.open(io.BytesIO(base64.b64decode(payload))).convert("RGB")
    raise ValueError(
        "only base64 data: image URLs are supported (no network egress)"
    )


def _normalize_images(imgs, cfg: ModelConfig) -> dict:
    if _is_raw_image(imgs):
        imgs = [imgs]
    if isinstance(imgs, (list, tuple)):
        proc = _get_image_processor(cfg)
        out = proc(images=list(imgs), return_tensors="np")
        return {
            "pixel_values": np.asarray(out["pixel_values"], np.float32),
            "image_grid_thw": [
                tuple(int(x) for x in g) for g in out["image_grid_thw"]
            ],
        }
    if "pixel_values" not in imgs or "image_grid_thw" not in imgs:
        raise ValueError(
            "image multi_modal_data must be raw image(s) or a dict with "
            "'pixel_values' and 'image_grid_thw'"
        )
    return {
        "pixel_values": np.asarray(imgs["pixel_values"], np.float32),
        "image_grid_thw": [
            tuple(int(x) for x in g) for g in imgs["image_grid_thw"]
        ],
    }


def _normalize_videos(vids, cfg: ModelConfig) -> dict:
    if isinstance(vids, np.ndarray) and vids.ndim == 4:  # one raw (T,H,W,C)
        vids = [vids]
    if isinstance(vids, (list, tuple)):
        proc = _get_image_processor(cfg)
        out = proc(images=None, videos=[list(v) for v in vids],
                   return_tensors="np")
        px = out["pixel_values_videos"]
        grids = out["video_grid_thw"]
        spg = [1.0] * len(grids)
    else:
        px = vids.get("pixel_values_videos")
        if px is None:
            px = vids.get("pixel_values")
        if px is None or "video_grid_thw" not in vids:
            raise ValueError(
                "video multi_modal_data must be raw frame arrays or a dict "
                "with 'pixel_values_videos' and 'video_grid_thw'"
            )
        grids = vids["video_grid_thw"]
        spg = vids.get("second_per_grid_ts")
        spg = [1.0] * len(grids) if spg is None else list(spg)
    return {
        "video_pixel_values": np.asarray(px, np.float32),
        "video_grid_thw": [tuple(int(x) for x in g) for g in grids],
        "video_second_per_grid": [float(x) for x in spg],
    }


def normalize_mm_data(mmd, cfg: ModelConfig) -> Optional[dict]:
    """Normalize multi_modal_data to preprocessed tensors:
    {"pixel_values", "image_grid_thw"} for images plus
    {"video_pixel_values", "video_grid_thw", "video_second_per_grid"} for
    videos. Accepts {"image": ..., "video": ...} nesting (raw arrays/PIL
    or preprocessed dicts) or the flat preprocessed image dict."""
    if mmd is None:
        return None
    out: dict = {}
    if "pixel_values" in mmd or "image_grid_thw" in mmd:
        out.update(_normalize_images(mmd, cfg))
    if "image" in mmd:
        out.update(_normalize_images(mmd["image"], cfg))
    if "video" in mmd:
        out.update(_normalize_videos(mmd["video"], cfg))
    if not out:
        raise ValueError(
            "multi_modal_data must carry 'image' and/or 'video' entries"
        )
    return out


def expand_placeholders(ids: list[int], mmd: dict, cfg: ModelConfig) -> list[int]:
    """Expand each single image/video placeholder token to the number of
    merged vision tokens its grid produces (the HF processor's expansion,
    done engine-side so raw chat-template prompts work). Image and video
    placeholders consume their own grid queues in appearance order."""
    hf = cfg.hf_config
    img = int(hf.get("image_token_id", 151655))
    vid = int(hf.get("video_token_id", 151656))
    merge = int((hf.get("vision_config") or {}).get("spatial_merge_size", 2))

    def counts(key):
        return [
            t * h * w // (merge * merge) for (t, h, w) in mmd.get(key) or []
        ]

    img_counts = counts("image_grid_thw")
    vid_counts = counts("video_grid_thw")
    occ = [i for i, t in enumerate(ids) if t in (img, vid)]
    if len(occ) == sum(img_counts) + sum(vid_counts):
        return list(ids)  # already expanded (pre-processed prompt)
    n_img_ph = sum(1 for i in occ if ids[i] == img)
    n_vid_ph = len(occ) - n_img_ph
    if n_img_ph != len(img_counts) or n_vid_ph != len(vid_counts):
        raise ValueError(
            f"prompt has {n_img_ph} image / {n_vid_ph} video placeholders "
            f"but {len(img_counts)} images / {len(vid_counts)} videos were "
            f"provided"
        )
    out: list[int] = []
    prev = 0
    iq, vq = iter(img_counts), iter(vid_counts)
    for pos in occ:
        cnt = next(iq) if ids[pos] == img else next(vq)
        out.extend(ids[prev:pos])
        out.extend([ids[pos]] * cnt)
        prev = pos + 1
    out.extend(ids[prev:])
    return out


def extract_chat_images(messages: list, tokenizer, cfg: ModelConfig):
    """OpenAI chat content parts → (text-only messages with vision
    placeholder strings spliced in, list of PIL images). Text-only
    messages pass through untouched."""
    hf = cfg.hf_config
    vs = hf.get("vision_start_token_id")
    img_tok = hf.get("image_token_id")
    ve = hf.get("vision_end_token_id")
    images = []
    out = []
    for msg in messages:
        content = msg.get("content")
        if not isinstance(content, list):
            out.append(msg)
            continue
        parts = []
        for part in content:
            ptype = part.get("type")
            if ptype == "text":
                parts.append(part.get("text", ""))
            elif ptype in ("image_url", "image"):
                url = part.get("image_url")
                if isinstance(url, dict):
                    url = url.get("url", "")
                images.append(image_from_url(url))
                if img_tok is None:
                    raise ValueError(
                        "model does not accept image inputs"
                    )
                ph_ids = [t for t in (vs, img_tok, ve) if t is not None]
                parts.append(tokenizer.decode(ph_ids))
            else:
                raise ValueError(f"unsupported content part type {ptype!r}")
        out.append({**msg, "content": "".join(parts)})
    return out, images

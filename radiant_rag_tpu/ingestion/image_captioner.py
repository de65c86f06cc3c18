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
    """Local VLM captioner from a checkpoint directory.

    Handles both model families the reference serves with one class
    (`image_captioner.py:148-420`): instruction VLMs whose AutoProcessor
    takes images+text (Qwen-VL class), and caption-only encoder-decoders
    (BLIP/TrOCR/VisionEncoderDecoder class) whose image processor takes
    images only and whose output decodes through the tokenizer."""

    def __init__(self, model_dir: str, max_new_tokens: int = 128) -> None:
        from transformers import (  # lazy
            AutoImageProcessor,
            AutoModelForVision2Seq,
            AutoTokenizer,
        )

        self.model = AutoModelForVision2Seq.from_pretrained(
            model_dir, local_files_only=True).eval()
        try:
            from transformers import AutoProcessor

            self.processor = AutoProcessor.from_pretrained(
                model_dir, local_files_only=True)
        except Exception:
            self.processor = None
        if self.processor is None or not hasattr(self.processor, "image_processor"):
            # caption-only family: separate image processor + tokenizer
            self.image_processor = AutoImageProcessor.from_pretrained(
                model_dir, local_files_only=True)
            self.tokenizer = AutoTokenizer.from_pretrained(
                model_dir, local_files_only=True)
        else:
            self.image_processor = None
            self.tokenizer = getattr(self.processor, "tokenizer", None)
        self.max_new_tokens = max_new_tokens

    def caption(self, image_path: str) -> str:
        import torch
        from PIL import Image

        image = Image.open(image_path).convert("RGB")
        if self.image_processor is not None:
            inputs = self.image_processor(images=image, return_tensors="pt")
        else:
            try:
                inputs = self.processor(images=image, text="Describe this image.",
                                        return_tensors="pt")
            except TypeError:  # processor without a text arg
                inputs = self.processor(images=image, return_tensors="pt")
        # never generate past the decoder's positional capacity (small
        # caption models crash with an embedding IndexError otherwise)
        dec_cfg = getattr(self.model.config, "decoder", self.model.config)
        cap = (getattr(dec_cfg, "n_positions", None)
               or getattr(dec_cfg, "max_position_embeddings", None))
        new_tokens = self.max_new_tokens if not cap else min(self.max_new_tokens, cap - 2)
        with torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=new_tokens)
        decoder = (self.processor.batch_decode if self.processor is not None
                   and hasattr(self.processor, "batch_decode")
                   else self.tokenizer.batch_decode)
        return decoder(out, skip_special_tokens=True)[0].strip()


def create_captioner(model_dir: str = "") -> BaseCaptioner:
    """Picker (reference `image_captioner.py:597`)."""
    if model_dir and Path(model_dir).is_dir():
        try:
            return HuggingFaceVLMCaptioner(model_dir)
        except Exception as exc:
            logger.warning("VLM captioner unavailable (%s); using metadata captioner", exc)
    return MetadataCaptioner()

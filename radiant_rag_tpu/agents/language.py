"""Language detection + translation.

Capability parity with reference `agents/language_detection.py:147` and
`agents/translation.py:112`. The reference downloads a fastText lid.176 model
(`language_detection.py:216-257`); this environment is zero-egress, so the
primary detector is a stopword/character-profile heuristic covering the
highest-traffic languages, with LLM detection as the high-accuracy option and
an external-model hook (`model_path`) when a local fastText file exists.
Translation is LLM-based with paragraph splitting for long texts
(`translation.py:252-374`).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)

# Minimal high-signal stopword profiles (top web languages).
_PROFILES: Dict[str, set] = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "was", "with", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "ich"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour", "pas", "je"},
    "es": {"el", "la", "los", "las", "es", "una", "del", "que", "por", "para", "con", "se"},
    "it": {"il", "la", "che", "di", "è", "un", "una", "per", "con", "non", "sono", "del"},
    "pt": {"o", "que", "de", "é", "um", "uma", "para", "com", "não", "os", "as", "do"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "niet", "met", "voor", "zijn", "ik"},
    "ru": {"и", "в", "не", "на", "что", "это", "как", "он", "по", "но", "из", "его"},
}

_SCRIPT_RANGES: List[Tuple[str, Tuple[int, int]]] = [
    ("zh", (0x4E00, 0x9FFF)),
    ("ja", (0x3040, 0x30FF)),
    ("ko", (0xAC00, 0xD7AF)),
    ("ru", (0x0400, 0x04FF)),
    ("ar", (0x0600, 0x06FF)),
    ("he", (0x0590, 0x05FF)),
    ("hi", (0x0900, 0x097F)),
    ("th", (0x0E00, 0x0E7F)),
    ("el", (0x0370, 0x03FF)),
]

LANGUAGE_NAMES = {
    "en": "English", "de": "German", "fr": "French", "es": "Spanish",
    "it": "Italian", "pt": "Portuguese", "nl": "Dutch", "ru": "Russian",
    "zh": "Chinese", "ja": "Japanese", "ko": "Korean", "ar": "Arabic",
    "he": "Hebrew", "hi": "Hindi", "th": "Thai", "el": "Greek",
}


class LanguageDetectionAgent:
    def __init__(self, llm=None, min_confidence: float = 0.5,
                 model_path: str = "") -> None:
        self.llm = llm
        self.min_confidence = min_confidence
        self._fasttext = None
        if model_path:
            try:  # optional local fastText model (reference's detector)
                import fasttext  # type: ignore

                self._fasttext = fasttext.load_model(model_path)
            except Exception as exc:
                logger.info("fastText unavailable (%s); using heuristic detector", exc)

    def detect(self, text: str) -> Tuple[str, float]:
        """Returns (language_code, confidence)."""
        if not text.strip():
            return "en", 0.0
        if self._fasttext is not None:
            labels, probs = self._fasttext.predict(text.replace("\n", " ")[:2000])
            code = labels[0].replace("__label__", "")
            return code, float(probs[0])
        code, conf = self._heuristic(text)
        if conf < self.min_confidence and self.llm is not None:
            llm_result = self._llm_detect(text)
            if llm_result is not None:
                return llm_result
        return code, conf

    def _heuristic(self, text: str) -> Tuple[str, float]:
        # script detection first (non-Latin scripts are unambiguous)
        counts: Dict[str, int] = {}
        sample = text[:2000]
        for ch in sample:
            cp = ord(ch)
            for code, (lo, hi) in _SCRIPT_RANGES:
                if lo <= cp <= hi:
                    counts[code] = counts.get(code, 0) + 1
                    break
        letters = sum(1 for c in sample if c.isalpha())
        if letters and counts:
            code, n = max(counts.items(), key=lambda kv: kv[1])
            if n / letters > 0.25:
                return code, min(1.0, 0.5 + n / letters)
        # Latin-script stopword profiles
        words = re.findall(r"[a-zà-ÿа-я]+", sample.lower())
        if not words:
            return "en", 0.1
        scores = {code: sum(1 for w in words if w in prof) / len(words)
                  for code, prof in _PROFILES.items()}
        code, score = max(scores.items(), key=lambda kv: kv[1])
        if score == 0.0:
            return "en", 0.2
        return code, min(1.0, score * 4)

    def _llm_detect(self, text: str) -> Optional[Tuple[str, float]]:
        try:
            raw = self.llm.chat_json([{
                "role": "user",
                "content": ('Identify the language. Reply ONLY {"code": "ISO 639-1", '
                            f'"confidence": float 0-1}}.\n\nText: {text[:800]}'),
            }], expect=dict)
            if raw and raw.get("code"):
                return str(raw["code"]).lower()[:2], float(raw.get("confidence", 0.8) or 0.8)
        except Exception as exc:
            logger.warning("LLM language detection failed: %s", exc)
        return None


class TranslationAgent:
    def __init__(self, llm, canonical_language: str = "en",
                 max_chars_per_llm_call: int = 4000) -> None:
        self.llm = llm
        self.canonical_language = canonical_language
        self.max_chars = max_chars_per_llm_call

    def translate(self, text: str, target: Optional[str] = None,
                  source: Optional[str] = None) -> str:
        """Translate, splitting long texts by paragraph
        (reference `translation.py:252-374`)."""
        target = target or self.canonical_language
        if not text.strip():
            return text
        chunks = self._split(text)
        out = []
        target_name = LANGUAGE_NAMES.get(target, target)
        for chunk in chunks:
            src_note = f" from {LANGUAGE_NAMES.get(source, source)}" if source else ""
            translated = self.llm.chat([{
                "role": "user",
                "content": (f"Translate the following text{src_note} to {target_name}. "
                            "Output ONLY the translation, preserving formatting.\n\n" + chunk),
            }])
            out.append(translated.strip())
        return "\n\n".join(out)

    def translate_with_detection(self, text: str, detector: LanguageDetectionAgent) -> Dict[str, Any]:
        code, conf = detector.detect(text)
        if code == self.canonical_language:
            return {"text": text, "translated": False, "source_language": code,
                    "confidence": conf}
        return {"text": self.translate(text, source=code), "translated": True,
                "source_language": code, "confidence": conf}

    def translate_batch(self, texts: List[str], target: Optional[str] = None) -> List[str]:
        return [self.translate(t, target=target) for t in texts]

    def _split(self, text: str) -> List[str]:
        if len(text) <= self.max_chars:
            return [text]
        paragraphs = text.split("\n\n")
        chunks: List[str] = []
        cur = ""
        for p in paragraphs:
            if len(cur) + len(p) + 2 > self.max_chars and cur:
                chunks.append(cur)
                cur = p
            else:
                cur = f"{cur}\n\n{p}" if cur else p
            while len(cur) > self.max_chars:  # single huge paragraph
                chunks.append(cur[: self.max_chars])
                cur = cur[self.max_chars :]
        if cur:
            chunks.append(cur)
        return chunks

"""Model artifact manager: download-with-progress + SHA-256 verification.

Capability parity with reference `utils/model_manager.py:24-254` (used there
to fetch the fastText lid.176 model). In zero-egress deployments only the
verification/caching paths are exercised; downloads activate when the
environment has network access.
"""

from __future__ import annotations

import hashlib
import logging
import os
import urllib.request
from pathlib import Path
from typing import Callable, Optional

logger = logging.getLogger(__name__)


def sha256_file(path: str, chunk_size: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while True:
            block = fh.read(chunk_size)
            if not block:
                break
            h.update(block)
    return h.hexdigest()


class ModelManager:
    def __init__(self, cache_dir: str = "~/.cache/radiant_tpu/models") -> None:
        self.cache_dir = Path(os.path.expanduser(cache_dir))

    def local_path(self, name: str) -> Path:
        return self.cache_dir / name

    def is_cached(self, name: str, sha256: Optional[str] = None) -> bool:
        p = self.local_path(name)
        if not p.is_file():
            return False
        if sha256 and sha256_file(str(p)) != sha256:
            logger.warning("checksum mismatch for cached %s; discarding", name)
            p.unlink()
            return False
        return True

    def ensure(self, name: str, url: str, sha256: Optional[str] = None,
               progress: Optional[Callable[[int, int], None]] = None) -> Optional[str]:
        """Return a local path, downloading if needed. None if unavailable."""
        if self.is_cached(name, sha256):
            return str(self.local_path(name))
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        target = self.local_path(name)
        tmp = str(target) + ".part"
        try:
            req = urllib.request.Request(url, headers={"User-Agent": "radiant-tpu/0.1"})
            with urllib.request.urlopen(req, timeout=60) as resp, open(tmp, "wb") as out:
                total = int(resp.headers.get("Content-Length", 0))
                done = 0
                while True:
                    block = resp.read(1 << 20)
                    if not block:
                        break
                    out.write(block)
                    done += len(block)
                    if progress:
                        progress(done, total)
            if sha256 and sha256_file(tmp) != sha256:
                os.unlink(tmp)
                logger.error("downloaded %s failed checksum verification", name)
                return None
            os.replace(tmp, target)
            return str(target)
        except Exception as exc:
            logger.warning("download of %s failed: %s", name, exc)
            if os.path.exists(tmp):
                os.unlink(tmp)
            return None

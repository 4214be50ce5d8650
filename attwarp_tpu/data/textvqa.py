"""TextVQA dataset reader (driver input).

Parity with ``main.py:82-181`` / ``main_batched.py:68-101``: loads the
``TextVQA_0.5.1_val.json`` layout (``{dataset_type, dataset_name,
dataset_version, data: [...]}``) and resolves ``{image_id}.jpg`` under the
image directory; optional flickr download is gated behind
``download_images`` (zero-egress environments simply skip missing images).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np
from PIL import Image


class TextVQADataset:
    def __init__(
        self,
        json_path: str,
        image_dir: Optional[str] = None,
        download_images: bool = False,
    ):
        self.json_path = json_path
        self.image_dir = image_dir
        self.download_images = download_images
        self.metadata: Dict[str, Any] = {}
        self.samples: List[Dict[str, Any]] = []
        try:
            with open(json_path, "r") as f:
                data = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError) as e:
            print(f"Error loading TextVQA json: {e}")
            return
        self.metadata = {
            "dataset_type": data.get("dataset_type"),
            "dataset_name": data.get("dataset_name"),
            "dataset_version": data.get("dataset_version"),
        }
        self.samples = data.get("data", [])

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if idx < 0 or idx >= len(self.samples):
            raise IndexError(idx)
        sample = dict(self.samples[idx])
        sample["loaded_image"] = self._get_image(sample)
        return sample

    def _get_image(self, sample: Dict[str, Any]) -> Optional[np.ndarray]:
        image_id = sample.get("image_id")
        if not image_id:
            return None
        if self.image_dir:
            path = os.path.join(self.image_dir, f"{image_id}.jpg")
            if os.path.exists(path):
                try:
                    with Image.open(path) as im:
                        return np.asarray(im.convert("RGB"))
                except Exception:
                    pass
        if self.download_images:
            url = sample.get("flickr_original_url") or sample.get("flickr_300k_url")
            if url:
                try:
                    import io
                    import urllib.request

                    with urllib.request.urlopen(url, timeout=15) as r:
                        img = Image.open(io.BytesIO(r.read())).convert("RGB")
                    if self.image_dir:
                        os.makedirs(self.image_dir, exist_ok=True)
                        img.save(os.path.join(self.image_dir, f"{image_id}.jpg"))
                    return np.asarray(img)
                except Exception:
                    return None
        return None

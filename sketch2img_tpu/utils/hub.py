"""HuggingFace Hub weight download/publishing (SURVEY.md §2.2 D12).

The reference downloads ``netG.pth`` from the hub (trainer.py:114) and
pushes per-epoch model exports to a repo (trainer.py:162-170, 273-279).
Both are gated: they require network access and a token, so callers treat
failures as soft (training proceeds without publishing)."""

from __future__ import annotations

import os
from typing import Optional

NETG_URL = "https://huggingface.co/datasets/nyanko7/tmp-public/resolve/main/netG.pth"


def download_netg(root: str = "./weights") -> Optional[str]:
    """Fetch the anime2sketch generator weights if absent (trainer.py:114)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "netG.pth")
    if os.path.exists(path):
        return path
    try:
        from huggingface_hub import hf_hub_download

        got = hf_hub_download(
            repo_id="nyanko7/tmp-public", filename="netG.pth",
            repo_type="dataset", local_dir=root,
        )
        return got
    except Exception as e:  # no network / no hub access
        print(f"[hub] netG.pth download unavailable ({e}); "
              f"provide --netg manually")
        return None


def push_file(repo_id: str, path: str, token: Optional[str] = None,
              commit_message: str = "update model") -> bool:
    """Upload a model artifact (per-epoch export, trainer.py:273-279)."""
    try:
        from huggingface_hub import HfApi

        HfApi().upload_file(
            path_or_fileobj=path,
            path_in_repo=os.path.basename(path),
            repo_id=repo_id,
            token=token or None,
            commit_message=commit_message,
        )
        return True
    except Exception as e:
        print(f"[hub] publish to {repo_id} failed ({e})")
        return False

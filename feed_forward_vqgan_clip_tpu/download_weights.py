"""Weight zoo downloader.

Parity with /root/reference/download_weights.py:29-45: idempotent fetches of the
released mapper/prior checkpoints, the VQGAN f16-16384 yaml+ckpt, and the ml-jku
CLOOB checkpoint (registry.MODEL_URLS / AUX_URLS keep the exact filenames and
URLs). Also fetches the CLIP BPE merge table the tokenizer needs. Uses urllib —
no wget dependency.
"""

import logging
import os
import urllib.request

from feed_forward_vqgan_clip_tpu.registry import AUX_URLS, MODEL_URLS

log = logging.getLogger(__name__)

BPE_URL = (
    "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz"
)


def download(url: str, target: str = None) -> str:
    target = target or os.path.basename(url)
    if os.path.exists(target):
        log.info("Skipping %s, already exists", target)
        return target
    log.info("Fetching %s -> %s", url, target)
    tmp = target + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, target)
    return target


def download_all():
    for url in AUX_URLS:
        download(url)
    download(BPE_URL)
    for path, url in MODEL_URLS.items():
        download(url, path)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    download_all()

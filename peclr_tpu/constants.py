"""Environment-derived paths and constants.

Mirrors the reference's env-var contract (src/constants.py:3-34,
README.md:28-39): BASE_PATH, DATA_PATH, SAVED_MODELS_BASE_PATH,
SAVED_META_INFO_PATH.  All fall back to repo-local defaults so the framework
runs out of the box (the reference hard-requires the env vars).
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_DIR = os.environ.get("BASE_PATH", REPO_ROOT)
DATA_PATH = os.environ.get("DATA_PATH", os.path.join(REPO_ROOT, "data", "raw"))

FREIHAND_DATA = os.path.join(DATA_PATH, "freihand_dataset")
YOUTUBE_DATA = os.path.join(DATA_PATH, "youtube_3d_hands", "data")

SAVED_MODELS_BASE_PATH = os.environ.get(
    "SAVED_MODELS_BASE_PATH", os.path.join(REPO_ROOT, "data", "models")
)
SAVED_META_INFO_PATH = os.environ.get(
    "SAVED_META_INFO_PATH", os.path.join(REPO_ROOT, "data", "meta")
)

STD_LOGGING_FORMAT = "%(name)s -%(levelname)s - %(message)s"

#: Remote experiment-tracking credentials, same env-var contract as the
#: reference (src/constants.py:24-29: COMET_API_KEY / COMET_PROJECT /
#: COMET_WORKSPACE).  Consumed only when PECLR_TRACKER=comet opts in —
#: tracking here is offline-first (JSONL), the remote mirrors it.
COMET_KWARGS = {
    "api_key": os.environ.get("COMET_API_KEY"),
    "project_name": os.environ.get("COMET_PROJECT"),
    "workspace": os.environ.get("COMET_WORKSPACE"),
}

#: FreiHAND geometry: 32,560 unique training images in 4 colorization
#: versions (gs/hom/sample/auto), 3,960 evaluation images
#: (testing/fh_utils.py:33-65)
FREIHAND_TRAIN_SIZE = 32560
FREIHAND_EVAL_SIZE = 3960
FREIHAND_VERSIONS = ("gs", "hom", "sample", "auto")

"""Feature detection + matching front-end (north-star scope).

The reference imports image-point measurements from PhotoModeler /
PhotoScan files only; it has no way to produce measurements from
images.  This package closes that gap TPU-first:

  detect.py   batched blob/corner detection (separable Gaussian
              filtering + NMS + top-k + subpixel refinement, one jit)
  describe.py batched patch descriptors (bilinear grid sampling)
  match.py    pairwise descriptor matching on the MXU (one matmul per
              pair, mutual-NN + Lowe ratio)
  tracks.py   host-side union-find track building and Project assembly
  render.py   synthetic coded-target image renderer (test/demo data)
  pipeline.py images -> measured network (Project), ready for
              pose-graph init + bundle
"""

from .detect import detect_blobs, detect_corners
from .describe import describe
from .match import match_pair, match_all_pairs
from .tracks import build_tracks, project_from_tracks
from .pipeline import network_from_images

__all__ = [
    "detect_blobs", "detect_corners", "describe", "match_pair",
    "match_all_pairs", "build_tracks", "project_from_tracks",
    "network_from_images",
]

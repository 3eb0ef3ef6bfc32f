"""Model registry (reference: /root/reference/models/__init__.py:6-9).

``SemStereo`` uses symmetric disparities [-maxdisp, maxdisp) (US3D);
``SemStereo_WHU`` uses the positive range [0, maxdisp) — implemented with the
correct positive-disparity ops the reference's WHU path only shape-checks
against (SURVEY.md section 2.7 item 3).
"""

import functools

from semstereo_tpu.models.semstereo import CHANS, CHANS2, FeatUp, SemStereo

SemStereoWHU = functools.partial(SemStereo, symmetric=False)

__models__ = {
    "SemStereo": SemStereo,
    "SemStereo_WHU": SemStereoWHU,
}

__all__ = ["SemStereo", "SemStereoWHU", "FeatUp", "CHANS", "CHANS2", "__models__"]

#!/bin/bash
# Round-4 CPU measurement batch (run while the TPU is idle; every job
# forces the CPU backend).  Produces the numbers for VERDICT tasks
# 3 (Sim3 health gate), 5 (BA-improves bound), 6 (cv2 parity split),
# 8 (speculative-surface decision regime).
set -u
cd /root/repo
CPU="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
PY="python"
export PYTHONPATH=/root/repo:/root/repo/tests

echo "=== [task 6] cv2 parity decomposition" >&2
$CPU timeout 3600 $PY scripts/parity_probe.py 2>/tmp/parity_r4.err

echo "=== [task 3] gate probe: healthy 300-frame soak (gate ON)" >&2
$CPU timeout 5400 $PY scripts/diag_drift.py --ba-window 4 \
    2>/tmp/gate300.err | grep -v "t_err" | head -40

echo "=== [task 3] gate probe: poisoned 1000-frame soak (gate ON)" >&2
$CPU timeout 10800 $PY scripts/diag_drift.py --frames 1000 --amplitude 20 \
    --max-keyframes 64 2>/tmp/gate1000.err | grep -v "t_err" | head -60

echo "=== [task 8] forward regime: chain baseline" >&2
$CPU timeout 5400 $PY scripts/diag_drift.py --path forward --near 8 \
    --far 20 --amplitude 7 --frames 150 2>/tmp/fwd_chain.err \
    | grep -v "t_err" | head -12
echo "=== [task 8] forward regime: map_anchor" >&2
$CPU timeout 5400 $PY scripts/diag_drift.py --path forward --near 8 \
    --far 20 --amplitude 7 --frames 150 --map-anchor \
    2>/tmp/fwd_map.err | grep -v "t_err" | head -16
echo "=== [task 8] forward regime: track_ref=keyframe" >&2
$CPU timeout 5400 $PY scripts/diag_drift.py --path forward --near 8 \
    --far 20 --amplitude 7 --frames 150 --track-ref keyframe \
    2>/tmp/fwd_kf.err | grep -v "t_err" | head -12

echo "=== [task 5] mono windowed-BA ratio on the odometry fixture" >&2
$CPU timeout 3600 $PY - <<'EOF' 2>/tmp/ba_ratio.err
import json
import numpy as np
from cusift_tpu.config import RansacConfig, SiftConfig
from cusift_tpu.data.evaluation import ate_rmse
from cusift_tpu.data.synthetic import two_plane_sequence
from cusift_tpu.models.odometry import MonoVO

# the exact fixture tests/test_odometry.py::seq + SIFT use
SIFT = SiftConfig(max_kpts=768, max_kpts_per_octave=512, num_octaves=4,
                  upscale=False)
seq = two_plane_sequence(n_frames=6, h=240, w=320, seed=3,
                         near=3.0, far=6.0, motion_scale=0.6)

def run(w):
    vo = MonoVO(seq.intr, sift_cfg=SIFT,
                ransac_cfg=RansacConfig(inlier_thresh_epi=4e-3),
                ba_window=w, ba_every=1)
    er, et = vo.run(list(seq.images))
    return float(ate_rmse(er, et, seq.poses_r, seq.poses_t,
                          with_scale=True))

raw, ba = run(0), run(4)
print(json.dumps({"ate_raw": raw, "ate_ba": ba,
                  "ratio": round(ba / max(raw, 1e-12), 3)}))
EOF

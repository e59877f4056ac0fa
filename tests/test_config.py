import numpy as np
import pytest

from orbslam3_tpu.utils.config import load_config

EUROC_YAML = """%YAML:1.0
Camera.type: "PinHole"
Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375
Camera.k1: -0.28340811
Camera.k2: 0.07395907
Camera.p1: 0.00019359
Camera.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
IMU.NoiseGyro: 1.7e-04
IMU.NoiseAcc: 2.0e-03
IMU.GyroWalk: 1.9e-05
IMU.AccWalk: 3.0e-03
IMU.Frequency: 200
"""


def test_load_euroc_style_yaml(tmp_path):
    p = tmp_path / "EuRoC.yaml"
    p.write_text(EUROC_YAML)
    cfg = load_config(str(p))
    assert cfg.camera_type == "PinHole"
    assert abs(cfg.K[0] - 458.654) < 1e-3
    assert abs(cfg.D[0] + 0.28340811) < 1e-6
    assert cfg.n_features == 1000
    assert cfg.has_imu
    assert cfg.imu_freq == 200


def test_missing_required_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text('%YAML:1.0\nCamera.fx: 100.0\n')
    with pytest.raises(ValueError):
        load_config(str(p))

"""End-to-end example drivers (each runs the example CLI in a subprocess
and asserts its OK line): Plaza2 range-only ISAM2, large stereo VO, the
six small tutorials, the discrete Asia/HMM/UGM examples, and the
view-graph transfer-factor example."""

import subprocess
import sys


def test_plaza2_truncated():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog','--steps','500']; "
        "exec(open('examples/range_isam_plaza2.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "PLAZA2 OK" in out.stdout, out.stdout + out.stderr


def test_stereo_vo_large():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog']; "
        "exec(open('examples/stereo_vo_large.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "STEREO-VO OK" in out.stdout, out.stdout + out.stderr


def test_parity_suite():
    """The 11 long-tail reference-example parities (GNC, LAGO, SPCG, LOST,
    fisheye, combined IMU, the two Point2 Kalman examples, essential view
    graph, METIS ordering, Pose3 chordal init)."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog']; "
        "exec(open('examples/parity_suite.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    assert "PARITY-SUITE OK" in out.stdout, out.stdout + out.stderr


def test_tutorials():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog']; "
        "exec(open('examples/tutorials.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "TUTORIALS OK" in out.stdout, out.stdout + out.stderr


def test_discrete_examples():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; sys.argv=['prog']; "
        "exec(open('examples/discrete_examples.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "DISCRETE-EXAMPLES OK" in out.stdout, out.stdout + out.stderr


def test_view_graph():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog']; "
        "exec(open('examples/view_graph.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "VIEW-GRAPH OK" in out.stdout, out.stdout + out.stderr


def test_victoria_park_truncated():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog','--n','800']; "
        "exec(open('examples/victoria_park.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "VICTORIA-PARK OK" in out.stdout, out.stdout + out.stderr


def test_balbianello_bundler():
    """Real Bundler data (Balbianello.out, 5 cams / 544 pts) through the
    packed BA engine via the BAL example CLI."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog',"
        "'/root/reference/examples/Data/Balbianello.out','--iters','20']; "
        "exec(open('examples/sfm_example_bal.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "final:" in out.stdout, out.stdout + out.stderr
    import re
    m = re.search(r"rms ([0-9.]+) px", out.stdout)
    assert m and float(m.group(1)) < 0.6, out.stdout


def test_isam2_smart_factor():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog']; "
        "exec(open('examples/isam2_smart_factor.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "ISAM2-SMART OK" in out.stdout, out.stdout + out.stderr


def test_fixed_lag_example():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog','--steps','14']; "
        "exec(open('examples/fixed_lag_smoother.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "FIXED-LAG OK" in out.stdout, out.stdout + out.stderr


def test_inverse_kinematics():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys; sys.argv=['prog']; "
        "exec(open('examples/inverse_kinematics.py').read())")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900)
    assert "IK OK" in out.stdout, out.stdout + out.stderr

"""Build hook: make wheels self-contained.

The checkout keeps the reference-compatible top-level layout
(``extra_data/`` assets, ``native/`` C++ source — reference README.md:21
expects the user to drop MANO_RIGHT.pkl into ``extra_data/``).  Installed
trees have no checkout around them, so at build time the shipped runtime
data is copied INTO the package — ``scat_tpu/_assets`` and
``scat_tpu/_native`` — where ``scat_tpu.assets.find_asset`` and
``scat_tpu.data.native_loader`` look last.  The copies exist only inside
built wheels, never in the checkout.
"""
import os
import shutil

from setuptools import setup
from setuptools.command.build_py import build_py

HERE = os.path.dirname(os.path.abspath(__file__))

# (checkout-relative source, package-relative destination)
_WHEEL_DATA = [
    ("extra_data/hand.obj", "_assets/hand.obj"),
    ("extra_data/mean_mano_params.pkl", "_assets/mean_mano_params.pkl"),
    ("native/scat_native.cpp", "_native/scat_native.cpp"),
    ("native/build.sh", "_native/build.sh"),
]


class BuildPyWithData(build_py):
    def run(self):
        super().run()
        for src, dst in _WHEEL_DATA:
            out = os.path.join(self.build_lib, "scat_tpu", dst)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            shutil.copyfile(os.path.join(HERE, src), out)


setup(cmdclass={"build_py": BuildPyWithData})

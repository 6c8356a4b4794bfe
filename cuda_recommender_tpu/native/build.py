"""``python -m cuda_recommender_tpu.native.build`` — compile the native lib."""

from . import build

if __name__ == "__main__":
    print(build(force=True, verbose=True))

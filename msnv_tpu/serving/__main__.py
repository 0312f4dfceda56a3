"""`python -m msnv_tpu.serving` — same entry as the msnv-serve script."""

from msnv_tpu.serving.cli import main

if __name__ == "__main__":
    main()

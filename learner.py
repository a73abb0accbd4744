"""Root-level training CLI entry point.

Role parity with the reference fork's root learner.py (a copy of
brax/training/learner.py kept at the repo root for direct invocation);
here it simply delegates to the packaged CLI.

Usage: python learner.py --env ant --learner ppo ...
"""

from brax_tpu.training.learner import main

if __name__ == "__main__":
    main()

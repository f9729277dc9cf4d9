"""``python -m ceracoder_tpu`` — the ceracoder-equivalent CLI app."""

import sys

from ceracoder_tpu.app.main import main

sys.exit(main())

import os
import sys

from .main import main

rc = main()
# hard-exit with the real rc: on a half-dead relay the axon plugin's C++
# teardown can abort the interpreter (exit 134) AFTER a fully successful
# run, breaking callers that check the exit status.  All outputs are
# already durable here (writer pools are joined inside handle_files, the
# profiler trace is written before main returns).
sys.stdout.flush()
sys.stderr.flush()
os._exit(rc)

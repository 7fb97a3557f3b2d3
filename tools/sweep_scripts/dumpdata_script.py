# Python-3 port of the reference harness script
# /root/reference/data/scripts/dumpdata_script.py (Apache-2.0): dumps
# 50*5*20022 deterministic integers to stdout (20000*i + k, each
# repeated 5x), then drains stdin. Same stdout byte stream as the
# reference's python-2 original (which cannot run under python3).
import sys

for i in range(50):
    for j in range(5):
        for k in range(20022):
            print(20000 * i + k)

for line in sys.stdin:
    pass

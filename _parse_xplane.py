import sys, glob, json
from xprof.convert import raw_to_tool_data as rtd
xs = sorted(glob.glob("/tmp/jtrace/**/*.xplane.pb", recursive=True))
print(xs)
data, _ = rtd.xspace_to_tool_data(xs, "hlo_op_stats", {})
import io, csv
# data may be json or csv depending on tool; try framework_op_stats too
try:
    j = json.loads(data)
    print(json.dumps(j)[:2000])
except Exception:
    print(type(data), str(data)[:1500])

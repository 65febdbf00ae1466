from radegs_tpu.ops.reference import render_reference

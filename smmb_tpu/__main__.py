"""CLI: ``python -m smmb_tpu {showcase,sweep,capacity,scaling,mlp,decode,lm,spec,headline}``.

The L5 automation surface (reference: ./benchmark.sh + parse-out2csv.sh +
performance.py, SURVEY.md §3.5) as one entry point.
"""

import sys


def main():
    from smmb_tpu.utils.cache import enable_compile_cache
    from smmb_tpu.utils.stamp import print_stamp

    print_stamp()  # every artifact records the commit it measured
    enable_compile_cache()
    args = sys.argv[1:]
    mode = args[0] if args else "showcase"
    rest = args[1:]
    if mode in ("showcase", "sweep"):
        from smmb_tpu.bench.sweep import main as sweep_main

        sweep_main([mode] + rest)
    elif mode == "mlp":
        from smmb_tpu.bench.mlp_bench import main as mlp_main

        mlp_main(rest)
    elif mode == "decode":
        from smmb_tpu.bench.decode_bench import main as decode_main

        decode_main(rest)
    elif mode == "lm":
        from smmb_tpu.bench.lm_bench import main as lm_main

        lm_main(rest)
    elif mode == "spec":
        from smmb_tpu.bench.spec_bench import main as spec_main

        spec_main(rest)
    elif mode == "scaling":
        from smmb_tpu.bench.scaling import main as scaling_main

        scaling_main(rest)
    elif mode == "capacity":
        from smmb_tpu.bench.capacity import main as capacity_main

        sys.exit(capacity_main(rest))
    elif mode == "headline":
        import runpy
        import os

        sys.argv = ["bench.py"]
        runpy.run_path(
            os.path.join(os.path.dirname(__file__), "..", "bench.py"),
            run_name="__main__",
        )
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()

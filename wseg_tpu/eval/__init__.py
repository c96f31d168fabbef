from wseg_tpu.eval.miou import do_python_eval, evaluate_dir

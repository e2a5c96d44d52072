from pointcloudhookup_tpu.cli import main

main()

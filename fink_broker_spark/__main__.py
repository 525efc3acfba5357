from fink_broker_spark.cli import main

if __name__ == "__main__":
    main()

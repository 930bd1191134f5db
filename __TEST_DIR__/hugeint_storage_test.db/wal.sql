CREATE TABLE hugeints (h HUGEINT);;
